// CIF (PDBx/mmCIF) tokenizer — native fast path for
// structure/mmcif.py:_tokenize_cif.
//
// Byte-for-byte port of the Python reference semantics (parity asserted
// in tests/test_native.py):
//   * lines starting ';' open a semicolon-delimited text block, closed
//     by the next line starting ';' (closing line's remainder is
//     discarded); the block is ONE literal token joined with '\n';
//   * blank lines and lines whose stripped form starts '#' are skipped;
//   * a stripped line containing a quote character is lexed with CIF
//     quoting rules: a quote opens a string only at token start and the
//     matching close quote must be followed by whitespace or EOL
//     (embedded quotes are data); '#' starts a comment only at a token
//     boundary outside quotes; quoted tokens are literal;
//   * otherwise the line splits on runs of ASCII whitespace, stopping
//     at a token that starts with '#'.
//
// The reference's native layer is C++ for its (PDB-only) parser
// [U: TorchProteinLibrary/Layers/FullAtomModel/cPDBLoader.cpp — mount
// empty]; this extends the same native-ingestion capability to the
// format modern archives actually distribute.  Like pdb_parser.cpp the
// fallback is the pure-Python implementation, so this is a fast path,
// never a requirement.
//
// C ABI (ctypes; see deeplocalproteindocking_tpu/native/cif_native.py):
//   void* cif_tokenize_v1(const char* text, long len, long* n_tokens);
//   const char*    cif_token_buffer (void* h);  // tokens, concatenated
//   const int64_t* cif_token_offsets(void* h);  // n+1 byte offsets
//   const uint8_t* cif_token_flags  (void* h);  // 1 = literal value
//   void           cif_free(void* h);

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Toks {
    std::string data;
    std::vector<int64_t> off{0};
    std::vector<uint8_t> flags;

    void push(const char* s, size_t n, bool literal) {
        data.append(s, n);
        off.push_back(static_cast<int64_t>(data.size()));
        flags.push_back(literal ? 1 : 0);
    }
    void push(const std::string& s, bool literal) {
        push(s.data(), s.size(), literal);
    }
};

inline bool is_ws(char c) {
    return c == ' ' || c == '\t' || c == '\v' || c == '\f' || c == '\r';
}

// One line, known to contain a quote char: CIF quoting rules.
void lex_quoted(const char* s, size_t n, Toks& out) {
    size_t i = 0;
    while (i < n) {
        char c = s[i];
        if (c == ' ' || c == '\t') { i++; continue; }
        if (c == '#') break;
        if (c == '\'' || c == '"') {
            char q = c;
            size_t j = i + 1;
            while (j < n && !(s[j] == q &&
                              (j + 1 == n || s[j + 1] == ' ' ||
                               s[j + 1] == '\t')))
                j++;
            out.push(s + i + 1, j - (i + 1), true);
            i = j + 1;
        } else {
            size_t j = i;
            while (j < n && s[j] != ' ' && s[j] != '\t') j++;
            out.push(s + i, j - i, false);
            i = j;
        }
    }
}

}  // namespace

extern "C" {

void* cif_tokenize_v1(const char* text, long len, long* n_tokens) {
    auto* out = new Toks();
    const char* p = text;
    const char* end = text + len;

    // Split into lines on '\n' / '\r\n' / lone '\r'.
    auto next_line = [&](const char*& lp, size_t& ln) -> bool {
        if (p >= end) return false;
        const char* q = p;
        while (q < end && *q != '\n' && *q != '\r') q++;
        lp = p;
        ln = static_cast<size_t>(q - p);
        if (q < end) {
            if (*q == '\r' && q + 1 < end && q[1] == '\n') q += 2;
            else q += 1;
        }
        p = q;
        return true;
    };

    const char* lp;
    size_t ln;
    while (next_line(lp, ln)) {
        if (ln > 0 && lp[0] == ';') {
            // Semicolon text block: join inner lines with '\n'.
            std::string block(lp + 1, ln - 1);
            const char* bl;
            size_t bn;
            while (next_line(bl, bn)) {
                if (bn > 0 && bl[0] == ';') break;  // close line dropped
                block.push_back('\n');
                block.append(bl, bn);
            }
            out->push(block, true);
            continue;
        }
        // strip ASCII whitespace
        size_t a = 0, b = ln;
        while (a < b && is_ws(lp[a])) a++;
        while (b > a && is_ws(lp[b - 1])) b--;
        if (a == b || lp[a] == '#') continue;
        bool quoted = false;
        for (size_t k = a; k < b; k++)
            if (lp[k] == '\'' || lp[k] == '"') { quoted = true; break; }
        if (quoted) {
            lex_quoted(lp + a, b - a, *out);
        } else {
            size_t i = a;
            while (i < b) {
                while (i < b && is_ws(lp[i])) i++;
                if (i >= b) break;
                size_t j = i;
                while (j < b && !is_ws(lp[j])) j++;
                if (lp[i] == '#') break;  // trailing comment token
                out->push(lp + i, j - i, false);
                i = j;
            }
        }
    }
    *n_tokens = static_cast<long>(out->flags.size());
    return out;
}

const char* cif_token_buffer(void* h) {
    return static_cast<Toks*>(h)->data.data();
}

const int64_t* cif_token_offsets(void* h) {
    return static_cast<Toks*>(h)->off.data();
}

const uint8_t* cif_token_flags(void* h) {
    return static_cast<Toks*>(h)->flags.data();
}

void cif_free(void* h) { delete static_cast<Toks*>(h); }

}  // extern "C"

// ---------------------------------------------------------------------
// Full _atom_site fast path: tokenize AND extract the atom table in
// C++, returning packed arrays (the per-token Python marshaling of the
// raw stream costs more than pure-Python tokenization — measured 0.4x;
// this path is where the native win actually lives, exactly like
// pdb_parse_v2).  Semantics mirror structure/mmcif.py:parse_mmcif_text
// row handling: ATOM/HETATM filter, Nth-distinct-model selection,
// auth_* -> label_* fallbacks, '.'/'?' as missing, row skipped on
// unparseable coords/seq id, occupancy defaulting to 1.0.

#include <cstdlib>

namespace {

struct AtomSite {
    std::vector<float> xyz;          // 3 per row
    std::vector<float> occ;
    std::vector<int32_t> rid;
    std::string names;               // 8 bytes per row, space-padded
    std::string res;                 // 4
    std::string chain;               // 2
    std::string icode;               // 2
    std::string alt;                 // 2
    long n = 0;
};

inline bool missing(const std::string& v) {
    // Only '.' and '?' are CIF null placeholders — an empty (quoted)
    // token is a present-but-empty VALUE, exactly as in the Python
    // parser's col(): an empty auth_seq_id skips the row via int(''),
    // an empty group_PDB fails the ATOM/HETATM filter, etc.
    return v == "." || v == "?";
}

inline void put_fixed(std::string& dst, const std::string& v, int w,
                      bool strip_quotes = false) {
    std::string s = v;
    if (strip_quotes) {
        // Python strips surrounding double then single quotes from
        // atom ids ONLY (mmcif.py: names.strip('"').strip("'")).
        size_t b = 0, e = s.size();
        while (e > b && (s[b] == '"')) b++;
        while (e > b && (s[e - 1] == '"')) e--;
        while (e > b && (s[b] == '\'')) b++;
        while (e > b && (s[e - 1] == '\'')) e--;
        s = s.substr(b, e - b);
    }
    for (int i = 0; i < w; i++)
        dst.push_back(i < static_cast<int>(s.size()) ? s[i] : ' ');
}

}  // namespace

extern "C" {

// Returns a handle; n_rows via out param.  include_het/model as in the
// Python parser; model_count_out receives the number of distinct
// pdbx_PDB_model_num values seen (for count_models / validation).
void* cif_atom_site_v1(const char* text, long len, int include_het,
                       int model, long* n_rows, long* model_count_out) {
    long n_toks = 0;
    Toks* toks = static_cast<Toks*>(
        cif_tokenize_v1(text, len, &n_toks));
    auto tok = [&](long i) -> std::string {
        return toks->data.substr(toks->off[i],
                                 toks->off[i + 1] - toks->off[i]);
    };
    auto lit = [&](long i) { return toks->flags[i] != 0; };
    auto lower = [](std::string s) {
        // unsigned char first: ::tolower on a negative (non-ASCII)
        // char is undefined behavior.
        for (auto& c : s)
            c = static_cast<char>(
                ::tolower(static_cast<unsigned char>(c)));
        return s;
    };
    auto is_kw = [&](long i, const char* kw) {
        return !lit(i) && lower(tok(i)) == kw;
    };
    auto is_tag = [&](long i) {
        return !lit(i) && !tok(i).empty() && tok(i)[0] == '_';
    };
    auto ends_loop = [&](long i) {
        if (lit(i)) return false;
        std::string s = tok(i);
        if (!s.empty() && s[0] == '_') return true;
        std::string ls = lower(s);
        return ls == "loop_" || ls == "stop_" ||
               ls.rfind("data_", 0) == 0;
    };

    auto* out = new AtomSite();
    std::vector<std::string> models_seen;   // post-group-filter (row
                                            // selection, == parser)
    std::vector<std::string> models_all;    // every row (== the
                                            // count_models semantics)

    long i = 0;
    while (i < n_toks) {
        if (!is_kw(i, "loop_")) { i++; continue; }
        long j = i + 1;
        std::vector<std::string> cols;
        while (j < n_toks && is_tag(j)) cols.push_back(tok(j++));
        if (cols.empty() ||
            cols[0].rfind("_atom_site.", 0) != 0) {
            while (j < n_toks && !ends_loop(j)) j++;
            i = j;
            continue;
        }
        auto cidx = [&](const char* key) -> long {
            std::string want = std::string("_atom_site.") + key;
            for (size_t k = 0; k < cols.size(); k++)
                if (cols[k] == want) return static_cast<long>(k);
            return -1;
        };
        long c_group = cidx("group_PDB");
        long c_model = cidx("pdbx_PDB_model_num");
        long c_x = cidx("Cartn_x"), c_y = cidx("Cartn_y"),
             c_z = cidx("Cartn_z");
        long c_rid_a = cidx("auth_seq_id"),
             c_rid_l = cidx("label_seq_id");
        long c_occ = cidx("occupancy");
        long c_nm_a = cidx("auth_atom_id"),
             c_nm_l = cidx("label_atom_id");
        long c_rs_a = cidx("auth_comp_id"),
             c_rs_l = cidx("label_comp_id");
        long c_ch_a = cidx("auth_asym_id"),
             c_ch_l = cidx("label_asym_id");
        long c_ic = cidx("pdbx_PDB_ins_code");
        long c_al = cidx("label_alt_id");
        long nc = static_cast<long>(cols.size());

        while (j < n_toks && !ends_loop(j)) {
            if (j + nc > n_toks) break;          // truncated final row
            const long row = j;                  // cells index THIS row
            j += nc;                             // (j advances past it)
            auto cell = [&](long c, const char* dflt) -> std::string {
                if (c < 0 || c >= nc) return dflt;
                std::string v = tok(row + c);
                return missing(v) ? dflt : v;
            };
            auto cell2 = [&](long c1, long c2,
                             const char* dflt) -> std::string {
                if (c1 >= 0 && c1 < nc) {
                    std::string v = tok(row + c1);
                    if (!missing(v)) return v;
                }
                if (c2 >= 0 && c2 < nc) {
                    std::string v = tok(row + c2);
                    if (!missing(v)) return v;
                }
                return dflt;
            };
            std::string grp = (c_group >= 0)
                ? cell(c_group, "ATOM") : "ATOM";
            {
                std::string ma = cell(c_model, "1");
                bool seen = false;
                for (auto& s : models_all)
                    if (s == ma) { seen = true; break; }
                if (!seen) models_all.push_back(ma);
            }
            if (grp == "HETATM" && !include_het) continue;
            if (grp != "ATOM" && grp != "HETATM") continue;
            std::string m = cell(c_model, "1");
            long mi = -1;
            for (size_t k = 0; k < models_seen.size(); k++)
                if (models_seen[k] == m) { mi = static_cast<long>(k);
                                           break; }
            if (mi < 0) {
                models_seen.push_back(m);
                mi = static_cast<long>(models_seen.size()) - 1;
            }
            if (mi + 1 != model) continue;
            std::string xs = cell(c_x, ""), ys = cell(c_y, ""),
                        zs = cell(c_z, "");
            char* e1; char* e2; char* e3;
            if (xs.empty() || ys.empty() || zs.empty()) continue;
            double x = std::strtod(xs.c_str(), &e1);
            double y = std::strtod(ys.c_str(), &e2);
            double z = std::strtod(zs.c_str(), &e3);
            if (*e1 || *e2 || *e3) continue;      // unparseable coords
            std::string rs = cell2(c_rid_a, c_rid_l, "0");
            char* er;
            long rid = std::strtol(rs.c_str(), &er, 10);
            // er == start: no digits consumed (e.g. an empty-quoted
            // token) — Python's int('') raises and skips the row.
            if (*er || er == rs.c_str()) continue;
            std::string os = cell(c_occ, "1.0");
            char* eo;
            double oc = std::strtod(os.c_str(), &eo);
            if (*eo || eo == os.c_str()) oc = 1.0;  // float(...) fallback
            out->xyz.push_back(static_cast<float>(x));
            out->xyz.push_back(static_cast<float>(y));
            out->xyz.push_back(static_cast<float>(z));
            out->occ.push_back(static_cast<float>(oc));
            out->rid.push_back(static_cast<int32_t>(rid));
            put_fixed(out->names, cell2(c_nm_a, c_nm_l, ""), 8,
                      /*strip_quotes=*/true);
            put_fixed(out->res, cell2(c_rs_a, c_rs_l, ""), 4);
            put_fixed(out->chain, cell2(c_ch_a, c_ch_l, "A"), 2);
            put_fixed(out->icode, cell(c_ic, ""), 2);
            put_fixed(out->alt, cell(c_al, ""), 2);
            out->n++;
        }
        i = j;
    }
    cif_free(toks);
    *n_rows = out->n;
    *model_count_out =
        static_cast<long>(models_all.empty() ? 1 : models_all.size());
    return out;
}

const float* cif_as_xyz(void* h) {
    return static_cast<AtomSite*>(h)->xyz.data();
}
const float* cif_as_occ(void* h) {
    return static_cast<AtomSite*>(h)->occ.data();
}
const int32_t* cif_as_rid(void* h) {
    return static_cast<AtomSite*>(h)->rid.data();
}
const char* cif_as_names(void* h) {
    return static_cast<AtomSite*>(h)->names.data();
}
const char* cif_as_res(void* h) {
    return static_cast<AtomSite*>(h)->res.data();
}
const char* cif_as_chain(void* h) {
    return static_cast<AtomSite*>(h)->chain.data();
}
const char* cif_as_icode(void* h) {
    return static_cast<AtomSite*>(h)->icode.data();
}
const char* cif_as_alt(void* h) {
    return static_cast<AtomSite*>(h)->alt.data();
}
void cif_as_free(void* h) { delete static_cast<AtomSite*>(h); }

}  // extern "C"

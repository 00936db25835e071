// Fast fixed-column PDB ATOM-record parser.
//
// Capability parity with the reference's C++ loader
// [U: TorchProteinLibrary/Layers/FullAtomModel/cPDBLoader.{h,cpp} —
// mount empty, unverified].  The reference parses into libtorch
// tensors; here the parser is libtorch-free: a two-pass C API filling
// caller-allocated (NumPy) buffers, bound from Python via ctypes
// (deeplocalproteindocking_tpu/native/pdb_native.py).  Parsing rules
// mirror the pure-Python fallback in structure/pdb.py exactly:
//  * ATOM records always; HETATM when include_hetatm != 0
//  * every altloc is emitted along with its occupancy (col 55-60,
//    1.0 when absent) — occupancy-based altloc selection is applied by
//    the shared helper structure/pdb.py:select_altlocs so both parsers
//    keep identical semantics
//  * stop at ENDMDL (first NMR model only)
//  * skip records shorter than 54 columns or with unparseable fields
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Atom {
  float xyz[3];
  float occupancy;    // col 55-60, 1.0 when absent/unparseable
  char atom_name[5];  // trimmed, NUL-terminated
  char res_name[4];
  char chain;
  char icode;         // insertion code (col 27), ' ' if none
  char altloc;        // col 17, ' ' if none
  int res_id;
};

// Trim leading/trailing spaces of line[start, start+len) into out.
void trim_into(const char* line, int start, int len, char* out, int cap) {
  int b = start, e = start + len;
  while (b < e && isspace((unsigned char)line[b])) b++;
  while (e > b && isspace((unsigned char)line[e - 1])) e--;
  int n = e - b;
  if (n > cap - 1) n = cap - 1;
  memcpy(out, line + b, n);
  out[n] = '\0';
}

bool parse_float_field(const char* line, size_t line_len, int start,
                       int len, float* out) {
  if (line_len < (size_t)(start + len)) return false;
  char buf[16];
  int n = len < 15 ? len : 15;
  memcpy(buf, line + start, n);
  buf[n] = '\0';
  char* end = nullptr;
  float v = strtof(buf, &end);
  if (end == buf) return false;
  *out = v;
  return true;
}

bool parse_int_field(const char* line, size_t line_len, int start, int len,
                     int* out) {
  if (line_len < (size_t)(start + len)) return false;
  char buf[16];
  int n = len < 15 ? len : 15;
  memcpy(buf, line + start, n);
  buf[n] = '\0';
  char* end = nullptr;
  long v = strtol(buf, &end, 10);
  if (end == buf) return false;
  *out = (int)v;
  return true;
}

bool parse_atoms(const char* path, int include_hetatm,
                 std::vector<Atom>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char line[1024];
  while (fgets(line, sizeof line, f)) {
    size_t len = strlen(line);
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r'))
      line[--len] = '\0';
    if (len >= 6 && memcmp(line, "ENDMDL", 6) == 0) break;
    bool is_atom = len >= 4 && memcmp(line, "ATOM", 4) == 0;
    bool is_het = len >= 6 && memcmp(line, "HETATM", 6) == 0;
    if (!is_atom && !(include_hetatm && is_het)) continue;
    if (len < 54) continue;
    Atom a;
    a.altloc = line[16];
    if (!parse_int_field(line, len, 22, 4, &a.res_id)) continue;
    if (!parse_float_field(line, len, 30, 8, &a.xyz[0])) continue;
    if (!parse_float_field(line, len, 38, 8, &a.xyz[1])) continue;
    if (!parse_float_field(line, len, 46, 8, &a.xyz[2])) continue;
    if (!parse_float_field(line, len, 54, 6, &a.occupancy))
      a.occupancy = 1.0f;
    trim_into(line, 12, 4, a.atom_name, sizeof a.atom_name);
    trim_into(line, 17, 3, a.res_name, sizeof a.res_name);
    a.chain = line[21];
    a.icode = len > 26 ? line[26] : ' ';
    out->push_back(a);
  }
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Pass 1: number of accepted ATOM records, or -1 on I/O error.
int pdb_count_atoms(const char* path, int include_hetatm) {
  std::vector<Atom> atoms;
  if (!parse_atoms(path, include_hetatm, &atoms)) return -1;
  return (int)atoms.size();
}

// Pass 2 (v2 ABI): fill caller buffers sized for `capacity` atoms:
//   coords      float32 [capacity * 3]
//   atom_names  char    [capacity * 4]  (space-padded, no NUL)
//   res_names   char    [capacity * 3]
//   chain_ids   char    [capacity]
//   res_ids     int32   [capacity]
//   icodes      char    [capacity]  (' ' when absent)
//   altlocs     char    [capacity]  (' ' when absent)
//   occupancies float32 [capacity]  (1.0 when absent)
// Returns the number of atoms written, or -1 on error.
int pdb_parse_v2(const char* path, int include_hetatm, int capacity,
                 float* coords, char* atom_names, char* res_names,
                 char* chain_ids, int* res_ids, char* icodes,
                 char* altlocs, float* occupancies) {
  std::vector<Atom> atoms;
  if (!parse_atoms(path, include_hetatm, &atoms)) return -1;
  int n = (int)atoms.size();
  if (n > capacity) n = capacity;
  for (int i = 0; i < n; i++) {
    const Atom& a = atoms[i];
    memcpy(coords + 3 * i, a.xyz, sizeof a.xyz);
    memset(atom_names + 4 * i, ' ', 4);
    memcpy(atom_names + 4 * i, a.atom_name, strlen(a.atom_name));
    memset(res_names + 3 * i, ' ', 3);
    memcpy(res_names + 3 * i, a.res_name, strlen(a.res_name));
    chain_ids[i] = a.chain;
    res_ids[i] = a.res_id;
    icodes[i] = a.icode;
    altlocs[i] = a.altloc;
    occupancies[i] = a.occupancy;
  }
  return n;
}

}  // extern "C"

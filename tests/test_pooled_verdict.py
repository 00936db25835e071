"""tools/pooled_verdict.py — pooled multi-band McNemar artifact."""
import importlib.util
import json
import os

import pytest

_HERE = os.path.dirname(__file__)


def _load():
    spec = importlib.util.spec_from_file_location(
        "pooled_verdict",
        os.path.join(_HERE, "..", "tools", "pooled_verdict.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _matrix(seed0, rows, protocol_extra=None):
    proto = dict(n_rotations=16, grid=16, n_complexes=4,
                 heldout_seeds=list(range(seed0, seed0 + 4)))
    proto.update(protocol_extra or {})
    d = {"protocol": proto}
    for row, hits in rows.items():
        d[row] = {"complexes": [
            dict(name=f"synth{seed0 + i}", hit_top1=bool(h),
                 hit_top10=True, best_lrmsd=1.0)
            for i, h in enumerate(hits)]}
    return d


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_pools_disjoint_bands_and_writes_artifact(tmp_path, capsys):
    pv = _load()
    _write(tmp_path, "eval_matrix_48.json", _matrix(100, {
        "learned_local": [1, 1, 1, 0], "shape_local": [1, 0, 1, 0]}))
    _write(tmp_path, "eval_matrix_48_band1400.json", _matrix(1400, {
        "learned_local": [1, 1, 0, 1], "shape_local": [0, 1, 0, 1]}))
    files, proto = pv.discover(str(tmp_path))
    assert len(files) == 2 and "heldout_seeds" not in proto
    pooled, prov = pv.pool(files)
    assert len(pooled["learned_local"]) == 8
    m = pv.mcnemar(pooled["learned_local"], pooled["shape_local"],
                   "hit_top1")
    assert m["n"] == 8 and m["a_hits"] == 6 and m["b_hits"] == 4
    assert (len(m["a_only"]), len(m["b_only"])) == (2, 0)
    assert m["p_two_sided"] == pytest.approx(0.5)
    assert [b["band"] for b in prov["learned_local"]] == [
        "eval_matrix_48.json", "eval_matrix_48_band1400.json"]


def test_protocol_mismatch_band_is_skipped(tmp_path, capsys):
    pv = _load()
    _write(tmp_path, "eval_matrix_48.json", _matrix(100, {
        "learned_local": [1, 1, 1, 0], "shape_local": [1, 0, 1, 0]}))
    _write(tmp_path, "eval_matrix_48_band1400.json",
           _matrix(1400, {"learned_local": [1, 1, 1, 1],
                          "shape_local": [1, 1, 1, 1]},
                   protocol_extra=dict(grid=32)))
    files, _ = pv.discover(str(tmp_path))
    assert [os.path.basename(p) for p, _ in files] == [
        "eval_matrix_48.json"]


def test_duplicate_complexes_error(tmp_path):
    pv = _load()
    _write(tmp_path, "eval_matrix_48.json",
           _matrix(100, {"shape_local": [1, 0, 1, 0]}))
    _write(tmp_path, "eval_matrix_48_band100.json",
           _matrix(100, {"shape_local": [1, 1, 1, 1]}))
    files, _ = pv.discover(str(tmp_path))
    with pytest.raises(SystemExit, match="disjoint"):
        pv.pool(files)


def test_partial_band_restricted_to_shared_complexes(tmp_path, capsys,
                                                     monkeypatch):
    """A band with only one row done must not skew the paired test."""
    pv = _load()
    _write(tmp_path, "eval_matrix_48.json", _matrix(100, {
        "learned_local": [1, 1, 1, 0], "shape_local": [1, 0, 1, 0]}))
    _write(tmp_path, "eval_matrix_48_band1500.json",
           _matrix(1500, {"shape_local": [0, 0, 0, 0]}))
    out = str(tmp_path / "verdict.json")
    monkeypatch.setattr("sys.argv",
                        ["pooled_verdict.py", str(tmp_path), out])
    pv.main()
    rep = json.loads(open(out).read())
    pair = rep["pairs"]["learned_local_vs_shape_local"]
    assert pair["hit_top1"]["n"] == 4          # band1500 excluded
    assert pair["hit_top1"]["a_hits"] == 3


def test_fingerprint_mismatch_row_is_skipped(tmp_path, capsys):
    """A re-graded band (different dtype/rank) must not pool as extra
    complexes even when the top-level protocol dict matches."""
    pv = _load()
    base = _matrix(100, {"learned_local": [1, 1, 1, 0],
                         "shape_local": [1, 0, 1, 0]})
    fp = dict(n_rot=16, grid=16, seed0=100, dtype="bfloat16", rank=0)
    for row in ("learned_local", "shape_local"):
        base[row]["fingerprint"] = dict(fp)
    _write(tmp_path, "eval_matrix_48.json", base)
    band = _matrix(1400, {"learned_local": [1, 1, 1, 1],
                          "shape_local": [1, 1, 1, 1]})
    band["learned_local"]["fingerprint"] = dict(fp, seed0=1400,
                                                dtype="float32")
    band["shape_local"]["fingerprint"] = dict(fp, seed0=1400)
    _write(tmp_path, "eval_matrix_48_band1400.json", band)
    files, _ = pv.discover(str(tmp_path))
    pooled, prov = pv.pool(files)
    # fp32-graded learned row skipped; matching shape row pooled
    assert len(pooled["learned_local"]) == 4
    assert len(pooled["shape_local"]) == 8
    assert "fingerprint differs" in capsys.readouterr().err


def test_platform_sensitivity_substitutes_parity_rows(tmp_path,
                                                      monkeypatch):
    """CPU-recomputed base-band rows drive a substituted re-pool.

    The parity file re-grades the SAME complexes (seeds 100+) on the
    other platform: it must never pool as extra complexes, only feed
    the sensitivity section (flip counts + substituted McNemar).
    """
    pv = _load()
    _write(tmp_path, "eval_matrix_48.json", _matrix(100, {
        "learned_local": [1, 1, 1, 0], "shape_local": [1, 0, 1, 0]}))
    # CPU re-grade flips learned synth101 to a miss.
    _write(tmp_path, "eval_matrix_48_cpu_parity.json", _matrix(100, {
        "learned_local": [1, 0, 1, 0], "shape_local": [1, 0, 1, 0]}))
    out = str(tmp_path / "verdict.json")
    monkeypatch.setattr("sys.argv",
                        ["pooled_verdict.py", str(tmp_path), out])
    pv.main()
    rep = json.loads(open(out).read())
    # parity file did not join the pooled bands
    assert rep["bands"] == ["eval_matrix_48.json"]
    assert rep["pairs"]["learned_local_vs_shape_local"][
        "hit_top1"]["a_hits"] == 3
    sens = rep["platform_sensitivity"]
    assert sens["flips"]["learned_local"]["n_flips"] == 1
    assert sens["flips"]["learned_local"]["detail"][0]["name"] == \
        "synth101"
    assert sens["flips"]["shape_local"]["n_flips"] == 0
    sub = sens["pairs"]["learned_local_vs_shape_local"]["hit_top1"]
    assert sub["a_hits"] == 2 and sub["b_hits"] == 2

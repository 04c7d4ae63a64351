"""bench.py budget machinery: source fingerprinting + warm-stage stamp."""

import importlib
import json
import sys


def _bench(monkeypatch, tmp_path):
    monkeypatch.setenv("KGE_CACHE", str(tmp_path))
    sys.modules.pop("bench", None)
    import bench

    return importlib.reload(bench)


def test_fingerprint_stable_and_source_sensitive(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    fp1 = bench.source_fingerprint()
    fp2 = bench.source_fingerprint()
    assert fp1 == fp2 and len(fp1) == 64


def test_stamp_roundtrip_and_mismatch(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    assert bench.load_stamp("abc") == set()
    bench.save_stamp("abc", {"negsamp_shared", "eval"})
    assert bench.load_stamp("abc") == {"negsamp_shared", "eval"}
    # a different source tree invalidates every warm stage
    assert bench.load_stamp("def") == set()
    # corrupt stamp file is treated as cold, not an error
    with open(bench.STAMP_FILE, "w") as f:
        f.write("{not json")
    assert bench.load_stamp("abc") == set()


def test_result_line_shape(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    bench.RESULTS.clear()
    bench.NOTES.clear()
    line = bench.result_line()
    assert line["value"] is None and line["extra"] == {}
    bench.RESULTS["negsamp_shared"] = 2.0e6
    bench.RESULTS["kvsall_queries_per_sec"] = 6.0e5
    bench.NOTES["multichip"] = "unavailable"
    line = bench.result_line()
    assert line["value"] == 2.0e6
    assert line["vs_baseline"] == 20.0
    assert line["extra"]["kvsall_queries_per_sec"] == 6.0e5
    assert line["extra"]["multichip"] == "unavailable"
    assert json.dumps(line)  # one serializable JSON line

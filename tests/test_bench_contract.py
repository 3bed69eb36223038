"""bench.py driver contract: parseable JSON artifact lines.

The driver records bench.py stdout as the round's BENCH artifact.  The
contract (bench.py docstring): the headline record prints as soon as the
default config is measured, and a second line repeats it with the
62M-edge scale fields added — so a harness timeout landing during the
(long: one-time tunnel session cost) scale phase still leaves a complete
first line, and a last-line reader gets the full record.
"""

import contextlib
import io
import json
import sys

import pytest


@pytest.fixture
def bench_mod(monkeypatch):
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench
    monkeypatch.setattr(bench, "SMALL", False)
    monkeypatch.setattr(bench, "cpu_baseline", lambda cfg: 2.0e6)
    # bench.main() mutates process-global conf (feature_dtype=bfloat16,
    # and the SCALE path sets storage_profile=minimal): restore it so
    # these contract tests cannot poison the rest of the suite
    from graph_learn_tpu.config import conf
    monkeypatch.setattr(conf, "feature_dtype", conf.feature_dtype)
    monkeypatch.setattr(conf, "storage_profile", conf.storage_profile)
    return bench


def _run_main(bench):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    return [json.loads(ln) for ln in buf.getvalue().splitlines()
            if ln.strip()]


def test_two_lines_headline_then_scale(bench_mod, monkeypatch):
    calls = []

    def fake_run(cfg):
        calls.append(cfg)
        return 54e6 if cfg is bench_mod.CFG_SCALE else 134e6

    monkeypatch.setattr(bench_mod, "run_bench", fake_run)
    recs = _run_main(bench_mod)
    assert len(recs) == 2 and len(calls) == 2
    first, last = recs
    assert first["metric"] == last["metric"] == "ego_sage_train_edges_per_s"
    assert first["unit"] == "edges/s/chip"
    assert "ego_sage_scale62m_edges_per_s" not in first
    assert last["ego_sage_scale62m_edges_per_s"] == 54e6
    assert last["vs_baseline"] == first["vs_baseline"] == round(134e6 / 2e6, 2)


def test_headline_survives_scale_phase_crash(bench_mod, monkeypatch):
    def fake_run(cfg):
        if cfg is bench_mod.CFG_SCALE:
            raise RuntimeError("killed mid-scale")
        return 134e6

    monkeypatch.setattr(bench_mod, "run_bench", fake_run)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(RuntimeError):
            bench_mod.main()
    recs = [json.loads(ln) for ln in buf.getvalue().splitlines()
            if ln.strip()]
    # the complete headline line is already on stdout
    assert len(recs) == 1
    assert recs[0]["value"] == 134e6


def test_scale_env_flag_single_line(bench_mod, monkeypatch):
    monkeypatch.setattr(bench_mod, "SCALE", True)
    monkeypatch.setattr(bench_mod, "run_bench", lambda cfg: 54e6)
    recs = _run_main(bench_mod)
    assert len(recs) == 1
    assert recs[0]["metric"] == "ego_sage_scale62m_edges_per_s"
    assert recs[0]["vs_baseline"] == round(54e6 / bench_mod.SCALE_BASELINE_EPS,
                                           2)

"""Auxiliary subsystems: VTK export, streaming sequence driver with
manifest-based resume, profiling hook."""

import os

import numpy as np
import pytest

from tpuflow.config import FlowConfig
from tpuflow.io import write_raw_u8
from tpuflow.io.vtk import write_flow_vtk
from tpuflow.parallel.multihost import SequenceManifest, process_sequence


def test_vtk_writer(tmp_path):
    u = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    v = -u
    p = str(tmp_path / "flow.vtk")
    write_flow_vtk(u, v, p)
    text = open(p).read()
    assert "STRUCTURED_POINTS" in text
    assert "DIMENSIONS 2 2 1" in text
    assert "VECTORS flow float" in text
    assert text.strip().splitlines()[-1].startswith("4 -4")


def make_seq(d, n=3, w=24, h=16):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    paths = []
    for i in range(n):
        img = 200.0 * np.exp(-((ys - h / 2) ** 2 + (xs - w / 2 - 0.5 * i) ** 2) / 18.0)
        p = os.path.join(d, f"f{i}.raw")
        write_raw_u8(p, img)
        paths.append(p)
    return [(paths[i], paths[i + 1]) for i in range(n - 1)]


CFG = FlowConfig(
    warp_levels_count=2,
    warp_scale_factor=0.6,
    outer_iterations_count=3,
    inner_iterations_count=2,
    median_radius=3,
    gaussian_sigma=0.8,
)


def test_process_sequence_and_resume(tmp_path):
    pairs = make_seq(str(tmp_path))
    out = str(tmp_path / "out")
    completed = process_sequence(pairs, 24, 16, out, CFG)
    assert completed == ["00000_", "00001_"]
    files = os.listdir(out)
    assert "00000_flow-u-24-16.raw" in files
    assert "00001_res.pgm" in files
    assert "manifest.jsonl" in files

    # Resume: nothing left to do.
    completed2 = process_sequence(pairs, 24, 16, out, CFG)
    assert completed2 == []

    # Manifest records both pairs.
    assert SequenceManifest(os.path.join(out, "manifest.jsonl")).done() == {
        "00000_",
        "00001_",
    }


def test_process_sequence_chained_matches_unchained(tmp_path):
    # chain=2 over 3 pairs (one full chunk + a padded tail chunk) must
    # write byte-identical flow files to the per-pair path.
    pairs = make_seq(str(tmp_path), n=4)
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    done1 = process_sequence(pairs, 24, 16, out1, CFG)
    done2 = process_sequence(pairs, 24, 16, out2, CFG, chain=2)
    assert sorted(done1) == sorted(done2) == ["00000_", "00001_", "00002_"]
    for pid in done1:
        for stem in (f"{pid}flow-u-24-16.raw", f"{pid}flow-v-24-16.raw",
                     f"{pid}res.pgm", f"{pid}amp-24-16.raw"):
            b1 = open(os.path.join(out1, stem), "rb").read()
            b2 = open(os.path.join(out2, stem), "rb").read()
            assert b1 == b2, stem

    # Resume works in chained mode too.
    assert process_sequence(pairs, 24, 16, out2, CFG, chain=2) == []


def test_process_sequence_dp_mesh_kill_and_resume(tmp_path, monkeypatch):
    """Data-parallel streaming soak (round-3 verdict stretch #8): B>1
    pairs per dispatch over a ('data',) mesh, killed mid-stream, then
    resumed — the remaining pairs complete EXACTLY once and the outputs
    are byte-identical to the single-stream path."""
    import jax

    import tpuflow.parallel.multihost as mh
    from tpuflow.parallel import make_mesh
    from tpuflow.solver import bucketed

    pairs = make_seq(str(tmp_path), n=8)  # 7 pairs
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    out = str(tmp_path / "out_dp")

    # "Kill" after the first dispatched group: the second batch call dies.
    real_batch = bucketed.compute_flow_bucketed_batch
    calls = {"n": 0}

    def dying_batch(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt("simulated mid-stream kill")
        return real_batch(*a, **kw)

    monkeypatch.setattr(bucketed, "compute_flow_bucketed_batch", dying_batch)
    with pytest.raises(KeyboardInterrupt):
        mh.process_sequence(pairs, 24, 16, out, CFG, mesh=mesh)
    done_after_kill = SequenceManifest(
        os.path.join(out, "manifest.jsonl")).done()
    assert done_after_kill == {"00000_", "00001_", "00002_", "00003_"}

    # Resume with the real engine: exactly the remainder, exactly once.
    monkeypatch.setattr(bucketed, "compute_flow_bucketed_batch", real_batch)
    completed = mh.process_sequence(pairs, 24, 16, out, CFG, mesh=mesh)
    assert sorted(completed) == ["00004_", "00005_", "00006_"]
    lines = open(os.path.join(out, "manifest.jsonl")).read().splitlines()
    ids = [__import__("json").loads(ln)["pair"] for ln in lines if ln.strip()]
    assert sorted(ids) == [f"{i:05d}_" for i in range(7)]
    assert len(ids) == len(set(ids)), "a pair was recorded twice"

    # Third run: nothing left.
    assert mh.process_sequence(pairs, 24, 16, out, CFG, mesh=mesh) == []

    # Value-parity vs the single-stream path (shard_map is a different
    # XLA program: bound mean EPE, not bytes — the documented
    # cross-program 1-ulp band).
    out1 = str(tmp_path / "out_single")
    process_sequence(pairs, 24, 16, out1, CFG)
    for pid in ids:
        for comp in ("flow-u", "flow-v"):
            a = np.fromfile(os.path.join(out1, f"{pid}{comp}-24-16.raw"),
                            dtype="<f4")
            b = np.fromfile(os.path.join(out, f"{pid}{comp}-24-16.raw"),
                            dtype="<f4")
            assert np.isfinite(b).all()
            assert np.abs(a - b).mean() < 1e-4, (pid, comp)


def test_profiling_trace_contextmanager(tmp_path):
    from tpuflow.utils.profiling import trace

    with trace(str(tmp_path / "trace")) as d:
        x = np.ones(4) + 1
    assert os.path.isdir(d)
    assert (x == 2).all()


def test_flow_energy_decreases_with_solving():
    from tpuflow.solver.flow2d import compute_flow
    from tpuflow.utils.diagnostics import flow_energy

    ys, xs = np.mgrid[0:32, 0:40].astype(np.float32)
    f0 = 200.0 * np.exp(-((ys - 16) ** 2 + (xs - 20) ** 2) / 40.0)
    f1 = 200.0 * np.exp(-((ys - 16.8) ** 2 + (xs - 21.1) ** 2) / 40.0)
    cfg = FlowConfig(
        warp_levels_count=3, warp_scale_factor=0.6, outer_iterations_count=8,
        inner_iterations_count=3, median_radius=3, gaussian_sigma=0.8,
    )
    zero = np.zeros_like(f0)
    e0 = flow_energy(f0, f1, zero, zero, cfg)
    res = compute_flow(f0, f1, cfg)
    e1 = flow_energy(f0, f1, res.u, res.v, cfg)
    assert float(e1.total) < float(e0.total), (float(e1.total), float(e0.total))
    assert float(e1.data) < float(e0.data)
    assert np.isfinite(float(e1.smoothness))


def test_timer_and_level_table():
    from tpuflow.solver.flow2d import LevelTrace
    from tpuflow.utils.timing import Timer, format_level_table

    with Timer() as t:
        sum(range(1000))
    assert t.seconds >= 0.0

    table = format_level_table(
        [LevelTrace(level=3, width=584, height=388, seconds=0.01),
         LevelTrace(level=2, width=526, height=350, seconds=0.005)]
    )
    lines = table.splitlines()
    assert len(lines) == 3
    assert "584x388" in lines[1] and "Mpix/s" in lines[0]


def test_process_sequence_mesh_chain_mutually_exclusive(tmp_path):
    """mesh= and chain>1 are different amortization strategies (chips vs
    fetch round trips) — passing both is a config error, not a silent
    preference."""
    import jax

    from tpuflow.parallel import make_mesh

    pairs = make_seq(str(tmp_path))
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="mutually exclusive"):
        process_sequence(pairs, 24, 16, str(tmp_path / "o"), CFG,
                         mesh=mesh, chain=2)

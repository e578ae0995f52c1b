"""AOT-serialized bench path (tools/bench_aot.py): pack -> load -> execute
without retracing, plus every staleness path bench.py falls back on."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)


def test_pack_bench_and_staleness(tmp_path):
    from tools import bench_aot

    path = str(tmp_path / "aot.bin")

    # missing artifact -> StaleArtifact naming the file
    with pytest.raises(bench_aot.StaleArtifact, match="missing"):
        bench_aot.load(path, batch=8, input_size=64)

    bench_aot.pack(path, batch=8, input_size=64, hb=lambda m: None)
    assert os.path.getsize(path) > 1000

    # the packed executable runs the step and produces a finite throughput
    ips = bench_aot.bench_aot(batch=8, input_size=64, warmup=2, iters=2,
                              hb=lambda m: None, path=path)
    assert ips > 0

    # environment drift (here: a different batch) -> fingerprint mismatch
    with pytest.raises(bench_aot.StaleArtifact, match="fingerprint mismatch"):
        bench_aot.load(path, batch=16, input_size=64)

    # corrupt payload -> unreadable, not a crash
    with open(path, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(bench_aot.StaleArtifact, match="unreadable"):
        bench_aot.load(path, batch=8, input_size=64)


def test_aot_matches_traced_step():
    """The deserialized executable computes the SAME step as the traced
    path: identical loss on identical inputs (same RNG streams by
    construction of _build_inputs)."""
    import jax

    from tools import bench_aot
    from podtpu.train.steps import make_train_step

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "aot.bin")
        bench_aot.pack(path, batch=8, input_size=64, hb=lambda m: None)
        loaded = bench_aot.load(path, batch=8, input_size=64)

        cfg, mesh, state, dbatch, rng = bench_aot._build_inputs(8, 64)
        sl = jax.tree_util.tree_leaves(state)
        bl = jax.tree_util.tree_leaves(dbatch)
        _, aot_loss = loaded(sl, bl, rng)

        cfg2, mesh2, state2, dbatch2, rng2 = bench_aot._build_inputs(8, 64)
        step = make_train_step(cfg2, mesh2, donate=False)
        _, metrics = step(state2, dbatch2, rng2)
        assert float(aot_loss) == pytest.approx(float(metrics["loss"]),
                                                rel=1e-5)

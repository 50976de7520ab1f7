"""Streamed resumable build pipeline: kill/resume mid-stream must produce a
bit-identical index (VERDICT round-1 item 6; reference analog is the
sequential add loop at test_ivfhnsw_sift1b.cpp:125-162)."""

import os

import jax
import numpy as np
import pytest

from ivfhnsw_tpu import IVFADCIndex, IndexConfig
from ivfhnsw_tpu.parallel import make_mesh
from ivfhnsw_tpu.parallel.pipeline import StreamedIndexBuild


@pytest.fixture(scope="module")
def trained():
    rng = np.random.RandomState(3)
    nb, d = 6 * 512, 32
    centers = rng.randn(32, d).astype(np.float32) * 5
    base = (centers[rng.randint(0, 32, nb)]
            + rng.randn(nb, d).astype(np.float32))
    cfg = IndexConfig(d=d, nc=64, code_size=8)
    idx = IVFADCIndex(cfg)
    key = jax.random.PRNGKey(0)
    idx.train_centroids(key, base[:2000], niter=8)
    idx.train_pq(key, base[:2000])
    return cfg, idx, base


def fresh_index(cfg, idx):
    i2 = IVFADCIndex(cfg)
    i2.set_centroids(np.asarray(idx.centroids))
    i2.pq, i2.norm_pq, i2.opq_R = idx.pq, idx.norm_pq, idx.opq_R
    return i2


def store_arrays(index):
    s = index._ensure_store()
    return {k: np.asarray(getattr(s, k))
            for k in ("codes", "ids", "norm_codes", "list_offsets")}


def run_batches(build, base, start=0, bs=512):
    for off in range(start, base.shape[0], bs):
        build.add_batch(base[off:off + bs])


def test_resume_bit_identical(trained, tmp_path):
    cfg, idx, base = trained
    mesh = make_mesh(8)

    # Uninterrupted run.
    a = StreamedIndexBuild(fresh_index(cfg, idx), mesh, str(tmp_path / "a"))
    run_batches(a, base)
    store_a = store_arrays(a.finalize())

    # Interrupted run: 3 committed batches, then a crash that leaves partial
    # (uncommitted) bytes in two spill files.
    wd = str(tmp_path / "b")
    b1 = StreamedIndexBuild(fresh_index(cfg, idx), mesh, wd)
    run_batches(b1, base[: 3 * 512])
    b1.close()
    with open(os.path.join(wd, "codes.u8"), "ab") as f:
        f.write(b"\x7f" * 123)            # torn write past the cursor
    with open(os.path.join(wd, "keys.i32"), "ab") as f:
        f.write(b"\x01" * 9)

    b2 = StreamedIndexBuild(fresh_index(cfg, idx), mesh, wd)
    assert b2.processed == 3 * 512        # resumed at the last commit
    run_batches(b2, base, start=b2.processed)
    store_b = store_arrays(b2.finalize())

    for k in store_a:
        np.testing.assert_array_equal(store_a[k], store_b[k], err_msg=k)


def test_pipeline_matches_plain_add(trained, tmp_path):
    cfg, idx, base = trained
    mesh = make_mesh(8)

    plain = fresh_index(cfg, idx)
    for off in range(0, base.shape[0], 512):
        plain.add_batch(base[off:off + 512])
    store_p = store_arrays(plain)

    s = StreamedIndexBuild(fresh_index(cfg, idx), mesh, str(tmp_path / "s"))
    run_batches(s, base)
    store_s = store_arrays(s.finalize())

    for k in store_p:
        np.testing.assert_array_equal(store_p[k], store_s[k], err_msg=k)


def test_pipeline_search_end_to_end(trained, tmp_path):
    from ivfhnsw_tpu import SearchParams
    cfg, idx, base = trained
    mesh = make_mesh(8)
    s = StreamedIndexBuild(fresh_index(cfg, idx), mesh, str(tmp_path / "e"))
    run_batches(s, base)
    index = s.finalize()
    d, l = index.search_enn(base[:64])
    assert (l == np.arange(64)).mean() > 0.9


_HOST_WORKER = r"""
import os, sys, json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from ivfhnsw_tpu import IVFADCIndex, IndexConfig
from ivfhnsw_tpu.parallel import make_mesh
from ivfhnsw_tpu.parallel.pipeline import (StreamedIndexBuild, host_slice)

root, host, num_hosts = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
base = np.load(os.path.join(root, "base.npy"))
cfg = IndexConfig(d=base.shape[1], nc=64, code_size=8)
idx = IVFADCIndex(cfg)
idx.set_centroids(np.load(os.path.join(root, "centroids.npy")))
idx.load_quantizers(os.path.join(root, "t.pq"), os.path.join(root, "t.npq"))
lo, hi = host_slice(base.shape[0], num_hosts, host)
mesh = make_mesh(4)
b = StreamedIndexBuild(idx, mesh, os.path.join(root, f"host_{host:03d}"))
for off in range(lo, hi, 512):
    n = min(512, hi - off)
    b.add_batch(base[off:off + n],
                np.arange(off, off + n, dtype=np.int32))
b.close()
print("done", host, b.processed)
"""


def test_two_host_build_merges_bit_identical(trained, tmp_path):
    """Two simulated hosts (separate processes, separate spill dirs) build
    disjoint contiguous slices; merge_host_spills must produce a store
    bit-identical to the single-host build of the full stream."""
    import subprocess
    import sys

    from ivfhnsw_tpu.parallel.pipeline import merge_host_spills

    cfg, idx, base = trained
    root = str(tmp_path)
    np.save(os.path.join(root, "base.npy"), base)
    np.save(os.path.join(root, "centroids.npy"), np.asarray(idx.centroids))
    idx.save_quantizers(os.path.join(root, "t.pq"),
                        os.path.join(root, "t.npq"))
    worker = os.path.join(root, "worker.py")
    with open(worker, "w") as f:
        f.write(_HOST_WORKER)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=repo_root + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen([sys.executable, worker, root, str(h), "2"],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for h in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-2000:]

    merged = merge_host_spills(
        fresh_index(cfg, idx),
        [os.path.join(root, f"host_{h:03d}") for h in range(2)])

    # Single-host reference build over the full stream (with explicit ids,
    # matching the workers').
    mesh = make_mesh(8)
    ref = StreamedIndexBuild(fresh_index(cfg, idx), mesh,
                             str(tmp_path / "single"))
    for off in range(0, base.shape[0], 512):
        ref.add_batch(base[off:off + 512],
                      np.arange(off, min(off + 512, base.shape[0]),
                                dtype=np.int32))
    ref_store = store_arrays(ref.finalize())
    got = store_arrays(merged)
    for k in ref_store:
        np.testing.assert_array_equal(got[k], ref_store[k])


def test_initialize_distributed_noop_without_env(monkeypatch):
    """On a single-host box (no JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/
    PROCESS_ID) the helper must be a no-op returning False, so builds run
    single-process over the local mesh."""
    from ivfhnsw_tpu.parallel.pipeline import initialize_distributed
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False

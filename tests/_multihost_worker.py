"""Worker for tests/test_multihost.py — one jax.distributed process.

Run as: python tests/_multihost_worker.py <coordinator> <num_procs> <pid>
        <tmpdir>

Exercises the multi-host path end-to-end on CPU devices:
  init_distributed -> global mesh over all processes' devices -> per-host
  disjoint data sharding (DataLoader auto_shard) -> global batch assembly ->
  jitted global-mean reduction (the sync_dist equivalent) -> collective
  orbax save + restore on EVERY process -> is_main_process gating.
Writes a JSON result file the parent asserts on.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    coordinator, num_procs, pid, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from enhancing_tpu.data import DataLoader, FakeImages
    from enhancing_tpu.parallel.mesh import (batch_sharding, init_distributed,
                                             is_main_process, make_mesh)

    init_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()

    mesh = make_mesh()                       # spans ALL processes' devices
    n_dev = mesh.devices.size
    local = len(jax.local_devices())

    # per-host disjoint shards (DataLoader auto_shard -> process_index)
    ds = FakeImages(length=8, resolution=8)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
    assert dl.shard_id == pid and dl.num_shards == num_procs
    batch = next(iter(dl))["image"]          # (4, 8, 8, 3) local shard
    local_sums = np.sum(batch, axis=(1, 2, 3)).tolist()

    # global batch: each host contributes its shard along the data axis
    garr = jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.asarray(batch, np.float32))
    assert garr.shape[0] == 4 * num_procs

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    gmean = float(global_mean(garr))

    # collective checkpoint: a sharded array + a replicated scalar; the
    # manager exists on EVERY process (regression: process-0-only gating
    # deadlocks multi-host saves). Host-local arrays are NOT serializable
    # in multi-host — everything must be a global array.
    from jax.sharding import NamedSharding, PartitionSpec
    step = jax.device_put(jnp.ones(()), NamedSharding(mesh, PartitionSpec()))
    state = {"x": garr, "step": step}
    mgr = ocp.CheckpointManager(Path(tmpdir) / "ckpt")
    mgr.save(0, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()

    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        state)
    restored = mgr.restore(0, args=ocp.args.StandardRestore(abstract))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(restored["x"].addressable_shards[0].data)),
        np.asarray(jax.device_get(state["x"].addressable_shards[0].data)))
    assert float(restored["step"]) == 1.0

    out = {"pid": pid, "devices": n_dev, "local_devices": local,
           "is_main": is_main_process(), "gmean": gmean,
           "local_sums": local_sums}
    Path(tmpdir, f"result_{pid}.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()

"""Parallelism: mesh construction, sharding rules, dp/tp train-step execution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from enhancing_tpu.models.stage2 import GPT
from enhancing_tpu.parallel import (
    batch_sharding,
    gpt_param_specs,
    make_mesh,
    place_params,
    shard_batch,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(data=4, model=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=2)


def test_gpt_param_specs():
    m = GPT(vocab_cond_size=4, vocab_img_size=16, embed_dim=32,
            cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=1)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 1), jnp.int32))
    specs = gpt_param_specs(vs["params"])
    # default layout is scan-stacked: kernels carry a leading layer axis
    blk = specs["blocks"]
    assert blk["attn"]["query"]["kernel"] == P(None, None, "model")
    assert blk["attn"]["proj"]["kernel"] == P(None, "model", None)
    assert blk["mlp"]["p0"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["p1"]["kernel"] == P(None, "model", None)
    assert specs["head"]["kernel"] == P(None, "model")
    # replicated leaves
    assert blk["ln1"]["scale"] == P()
    assert specs["pos_emb_code"] == P()
    assert blk["attn"]["proj"]["bias"] == P()  # row-parallel bias replicated
    assert blk["attn"]["query"]["bias"] == P(None, "model")

    # per-layer (unrolled) layout keeps the 2-D specs
    m2 = GPT(vocab_cond_size=4, vocab_img_size=16, embed_dim=32,
             cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=1,
             scan_layers=False)
    vs2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                  jnp.zeros((1, 1), jnp.int32))
    specs2 = gpt_param_specs(vs2["params"])
    assert specs2["blocks_0"]["attn"]["query"]["kernel"] == P(None, "model")


def test_tp_forward_matches_replicated():
    """GPT forward under 4-way tensor parallelism == single-device forward."""
    m = GPT(vocab_cond_size=4, vocab_img_size=64, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16), jnp.int32),
                jnp.zeros((2, 1), jnp.int32))
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 16)),
                        jnp.int32)
    conds = jnp.zeros((2, 1), jnp.int32)
    ref = m.apply(vs, codes, conds)

    mesh = make_mesh(data=2, model=4)
    params = place_params(mesh, vs["params"], gpt_param_specs(vs["params"]))
    codes_s = jax.device_put(codes, batch_sharding(mesh))
    conds_s = jax.device_put(conds, batch_sharding(mesh))
    out = jax.jit(lambda p, c, cc: m.apply({"params": p}, c, cc))(
        params, codes_s, conds_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"image": np.zeros((16, 4, 4, 3), np.float32)}
    out = shard_batch(mesh, batch)
    sh = out["image"].sharding
    assert sh.spec == P("data")


def test_dp_gradients_match_single_device():
    """Data-parallel loss/gradients == single-device on the same batch."""
    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    tiny = dict(dim=32, depth=1, heads=2, mlp_dim=64)
    model = ViTVQ(image_size=16, patch_size=8, encoder=tiny, decoder=tiny,
                  quantizer=dict(embed_dim=8, n_embed=32))
    x = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3)),
                    jnp.float32)

    def loss_fn(params, x):
        rec, qloss = model.module.apply(
            {"params": params, "constants": model.constants}, x)
        return jnp.mean(jnp.square(rec - x)) + qloss

    g_single = jax.grad(loss_fn)(model.params, x)

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    ps = jax.tree.map(
        lambda a: jax.device_put(a, jax.sharding.NamedSharding(mesh, P())),
        model.params)
    g_dp = jax.jit(jax.grad(loss_fn))(ps, xs)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_sampling_matches_per_shard(devices):
    """sample_gpt_sharded over an 8-device data mesh == running sample_gpt
    per shard with that shard's rng stream; batch decodes data-parallel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import GPT, sample_gpt, sample_gpt_sharded
    from enhancing_tpu.parallel import make_mesh

    n = len(devices)
    mesh = make_mesh(data=n, model=1, devices=devices)
    m = GPT(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=8, n_heads=4, n_layers=2)
    conds = jnp.asarray(
        np.random.default_rng(0).integers(0, 10, (2 * n, 1)), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32),
                conds[:2])
    rng = jax.random.PRNGKey(7)
    logits, codes = sample_gpt_sharded(mesh, m, vs, conds, rng, top_k=8)
    assert codes.shape == (2 * n, 8)
    assert logits.shape == (2 * n, 8, 32)

    keys = jax.random.split(rng, n)
    for shard in range(n):
        lo, hi = 2 * shard, 2 * shard + 2
        _, want = sample_gpt(m, vs, conds[lo:hi], keys[shard], top_k=8)
        np.testing.assert_array_equal(np.asarray(codes[lo:hi]),
                                      np.asarray(want))


def test_sharded_rq_sampling_matches_per_shard(devices):
    """sample_rq_sharded over an 8-device data mesh == running sample_rq
    per shard with that shard's rng stream (the GPT pin's RQ sibling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import (RQTransformer, sample_rq,
                                             sample_rq_sharded)
    from enhancing_tpu.parallel import make_mesh

    n = len(devices)
    mesh = make_mesh(data=n, model=1, devices=devices)
    m = RQTransformer(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
                      cond_num_tokens=1, img_num_tokens=4, depth_num_tokens=2,
                      spatial_n_heads=4, depth_n_heads=4, spatial_n_layers=2,
                      depth_n_layers=2)
    conds = jnp.asarray(
        np.random.default_rng(0).integers(0, 10, (n, 1)), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2), jnp.int32),
                conds[:1])
    rng = jax.random.PRNGKey(1)
    logits, codes = sample_rq_sharded(mesh, m, vs, conds, rng, top_k=8)
    assert codes.shape == (n, 4, 2)
    assert logits.shape == (n * 4, 2, 32)
    assert np.isfinite(np.asarray(logits)).all()

    keys = jax.random.split(rng, n)
    for shard in range(n):
        _, want = sample_rq(m, vs, conds[shard:shard + 1], keys[shard],
                            top_k=8)
        np.testing.assert_array_equal(np.asarray(codes[shard:shard + 1]),
                                      np.asarray(want))


def test_zero1_optimizer_state_sharded_and_training_matches(devices):
    """zero1=True shards Adam moments over 'data' (leaves actually land
    sharded) and 2 training steps match the replicated-run losses."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    from enhancing_tpu.parallel import make_mesh
    from enhancing_tpu.train import Trainer

    n = len(devices)
    mesh = make_mesh(data=n, model=1, devices=devices)
    tiny = dict(dim=64, depth=2, heads=2, mlp_dim=128)

    loss_cfg = {"target": "enhancing_tpu.losses.vqperceptual.VQLPIPS",
                "params": {"image_size": 32, "perceptual_weight": 0.0}}

    def build(zero1):
        model = ViTVQ(image_size=32, patch_size=8, encoder=tiny, decoder=tiny,
                      quantizer=dict(embed_dim=16, n_embed=64), loss=loss_cfg)
        tr = Trainer(max_epochs=1, base_lr=1e-4, mesh=mesh, log_every=10**9,
                     max_steps=2, zero1=zero1)
        state, step, _ = tr._build_stage1(model)
        return tr, state, step

    x = jnp.asarray(np.random.default_rng(0).random((2 * n, 32, 32, 3)),
                    jnp.float32)
    rng = jax.random.PRNGKey(0)

    tr0, s0, step0 = build(False)
    tr1, s1, step1 = build(True)

    # the largest moment leaves really are sharded over 'data'
    sharded_leaves = [l for l in jax.tree.leaves(s1.ae_opt)
                      if hasattr(l, "sharding") and
                      any(sp is not None for sp in (l.sharding.spec or ()))]
    assert sharded_leaves, "no optimizer-state leaf got a data sharding"

    logs = []
    for st, step, tr in ((s0, step0, tr0), (s1, step1, tr1)):
        xs = tr._shard(x)
        st, log = step(st, xs, rng, jnp.float32(1.0))
        st, log = step(st, xs, rng, jnp.float32(1.0))
        logs.append(float(log["train/total_loss"]))
    np.testing.assert_allclose(logs[0], logs[1], rtol=1e-5)


def test_tp_sharded_params_sampling_matches_replicated(devices):
    """sample_gpt under plain jit/GSPMD with Megatron-sharded (tp) params ==
    replicated-params sampling. The shipped 6144d x 24L prior (~11B params)
    cannot fit one chip's HBM, so decode must run with the param tree left
    model-sharded; GSPMD inserts the collectives."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import GPT, sample_gpt
    from enhancing_tpu.parallel import make_mesh
    from enhancing_tpu.parallel.sharding import gpt_param_specs, place_params

    n = len(devices)
    tp = 2 if n % 2 == 0 else 1
    mesh = make_mesh(data=n // tp, model=tp, devices=devices)
    m = GPT(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=8, n_heads=4, n_layers=2)
    conds = jnp.zeros((4, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 8), jnp.int32), conds)
    rng = jax.random.PRNGKey(3)

    _, want = sample_gpt(m, vs, conds, rng, top_k=8)

    specs = {"params": gpt_param_specs(vs["params"])}
    vs_tp = place_params(mesh, vs, specs)
    # verify at least one kernel actually landed model-sharded
    shards = [l for l in jax.tree.leaves(vs_tp["params"])
              if hasattr(l, "sharding") and
              any(sp is not None for sp in (l.sharding.spec or ()))]
    if tp > 1:
        assert shards, "no param leaf got a model sharding"
    with mesh:
        _, got = sample_gpt(m, vs_tp, conds, rng, top_k=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sequence_parallel_gpt_matches_replicated(devices):
    """sp_mesh (Megatron-SP residual-stream constraints) changes only the
    layout: forward logits and grads match the unannotated module, including
    a sequence length (17) not divisible by the model axis (4)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from enhancing_tpu.models.stage2 import GPT
    from enhancing_tpu.parallel import make_mesh
    from enhancing_tpu.parallel.sharding import gpt_param_specs, place_params

    mesh = make_mesh(data=2, model=4, devices=devices)
    rng = np.random.default_rng(0)
    m = GPT(vocab_cond_size=10, vocab_img_size=32, embed_dim=128,
            cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)
    codes = jnp.asarray(rng.integers(0, 32, (4, 16)), jnp.int32)
    conds = jnp.asarray(rng.integers(0, 10, (4, 1)), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), codes, conds)
    want = m.apply(vs, codes, conds)

    m_sp = dataclasses.replace(m, sp_mesh=mesh)
    vs_sp = place_params(mesh, vs, {"params": gpt_param_specs(vs["params"])})
    bs = NamedSharding(mesh, P("data"))
    codes_s = jax.device_put(codes, bs)
    conds_s = jax.device_put(conds, bs)
    got = jax.jit(m_sp.apply)(vs_sp, codes_s, conds_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def loss(variables, mod):
        return jnp.sum(jnp.square(mod.apply(variables, codes, conds)))

    g0 = jax.grad(lambda v: loss(v, m))(vs)
    g1 = jax.jit(jax.grad(lambda v: loss(v, m_sp)))(vs_sp)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-4)


def test_trainer_sp_flag_stage2(devices):
    """Trainer(sp=True) rebinds the prior with sp_mesh and trains."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.parallel import make_mesh
    from enhancing_tpu.train import Trainer
    from enhancing_tpu.utils.config import ConfigDict, initialize_from_config

    mesh = make_mesh(data=4, model=2, devices=devices)
    tiny = dict(dim=32, depth=1, heads=2, mlp_dim=64)
    cfg = ConfigDict({
        "target": "enhancing_tpu.models.stage2.transformer.CondTransformer",
        "params": {
            "cond_key": "class",
            "stage1": {
                "target": "enhancing_tpu.models.stage1.vitvqgan.ViTVQ",
                "params": {"image_size": 16, "patch_size": 4,
                           "encoder": tiny, "decoder": tiny,
                           "quantizer": {"embed_dim": 8, "n_embed": 32}}},
            "cond": {
                "target": "enhancing_tpu.models.cond.dummycond.ClassCond",
                "params": {"image_size": 16,
                           "class_name": "assets/class/imagenet.txt"}},
            "transformer": {
                "target": "enhancing_tpu.models.stage2.layers.GPT",
                "params": {"vocab_cond_size": 1000, "vocab_img_size": 32,
                           "embed_dim": 64, "cond_num_tokens": 1,
                           "img_num_tokens": 16, "n_heads": 2,
                           "n_layers": 2}}}})
    model = initialize_from_config(cfg)
    tr = Trainer(max_epochs=1, base_lr=1e-4, mesh=mesh, log_every=10**9,
                 max_steps=1, sp=True)
    state, step = tr._build_stage2(model)
    assert model.transformer.sp_mesh is mesh
    images = tr._shard(jnp.asarray(
        np.random.default_rng(0).random((8, 16, 16, 3)), jnp.float32))
    conds = tr._shard(jnp.zeros((8, 1), jnp.int32))
    state, log = step(state, images, conds)
    assert np.isfinite(float(log["train/total_loss"]))


def test_pipeline_parallel_gpt_matches_replicated(devices):
    """GPipe pipeline over the 'pipe' mesh axis: forward logits and grads
    match the plain scanned module exactly (stages = sharding of the
    stacked layer axis; schedule = shard_map + ppermute, AD'd through)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import GPT
    from enhancing_tpu.parallel import make_mesh
    from enhancing_tpu.parallel.pipeline import (gpt_apply_pipelined,
                                                 place_stage_params)

    mesh = make_mesh(data=2, model=1, pipe=4, devices=devices)
    rng = np.random.default_rng(0)
    m = GPT(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=16, n_heads=2, n_layers=4)
    codes = jnp.asarray(rng.integers(0, 32, (8, 16)), jnp.int32)
    conds = jnp.asarray(rng.integers(0, 10, (8, 1)), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), codes, conds)
    want = m.apply(vs, codes, conds)

    vs_pp = {"params": dict(vs["params"])}
    vs_pp["params"]["blocks"] = place_stage_params(mesh,
                                                   vs["params"]["blocks"])
    f = jax.jit(lambda v, c, cn: gpt_apply_pipelined(
        m, v, c, cn, mesh=mesh, n_microbatches=4))
    got = f(vs_pp, codes, conds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def loss(v):
        return jnp.mean(jnp.square(gpt_apply_pipelined(
            m, v, codes, conds, mesh=mesh, n_microbatches=4)))

    def loss_ref(v):
        return jnp.mean(jnp.square(m.apply(v, codes, conds)))

    g0 = jax.grad(loss_ref)(vs)
    g1 = jax.jit(jax.grad(loss))(vs_pp)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_trainer_pipeline_parallel_stage2(devices):
    """Trainer on a dp x tp x pp mesh: params land pipe-sharded and the
    2-step loss matches a replicated-mesh run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.parallel import make_mesh
    from enhancing_tpu.train import Trainer
    from enhancing_tpu.utils.config import ConfigDict, initialize_from_config

    tiny = dict(dim=32, depth=1, heads=2, mlp_dim=64)
    cfg = ConfigDict({
        "target": "enhancing_tpu.models.stage2.transformer.CondTransformer",
        "params": {
            "cond_key": "class",
            "stage1": {
                "target": "enhancing_tpu.models.stage1.vitvqgan.ViTVQ",
                "params": {"image_size": 16, "patch_size": 4,
                           "encoder": tiny, "decoder": tiny,
                           "quantizer": {"embed_dim": 8, "n_embed": 32}}},
            "cond": {
                "target": "enhancing_tpu.models.cond.dummycond.ClassCond",
                "params": {"image_size": 16,
                           "class_name": "assets/class/imagenet.txt"}},
            "transformer": {
                "target": "enhancing_tpu.models.stage2.layers.GPT",
                "params": {"vocab_cond_size": 1000, "vocab_img_size": 32,
                           "embed_dim": 64, "cond_num_tokens": 1,
                           "img_num_tokens": 16, "n_heads": 2,
                           "n_layers": 4}}}})
    images = np.random.default_rng(0).random((8, 16, 16, 3)).astype(
        np.float32)
    conds = np.zeros((8, 1), np.int32)

    losses = {}
    for label, (d, m_, p_) in (("rep", (8, 1, 1)), ("pp", (2, 2, 2))):
        mesh = make_mesh(data=d, model=m_, pipe=p_, devices=devices)
        model = initialize_from_config(cfg)
        tr = Trainer(max_epochs=1, base_lr=1e-4, mesh=mesh, log_every=10**9,
                     max_steps=2, microbatches=2)
        st, step = tr._build_stage2(model)
        for _ in range(2):
            st, log = step(st, tr._shard(jnp.asarray(images)),
                           tr._shard(jnp.asarray(conds)))
        losses[label] = float(log["train/total_loss"])
        if p_ > 1:
            pipe_leaves = [
                l for l in jax.tree.leaves(st.params)
                if hasattr(l, "sharding") and l.sharding.spec
                and "pipe" in str(l.sharding.spec)]
            assert pipe_leaves, "no param leaf landed pipe-sharded"
    np.testing.assert_allclose(losses["rep"], losses["pp"], rtol=1e-5)


def test_continuous_batcher_sharded_slots_match_unsharded(devices):
    """Continuous batcher with slots sharded over the data axis: staggered
    greedy admissions produce the same sequences as the unsharded pool."""
    import numpy as np

    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher
    from enhancing_tpu.models.stage2.layers import GPT

    mesh = make_mesh(data=2, model=1, devices=devices[:2])
    m = GPT(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=8, n_heads=4, n_layers=2)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 1), jnp.int32))

    def run(mesh_arg):
        b = ContinuousGPTBatcher(m, vs, num_slots=4,
                                 rng=jax.random.PRNGKey(3), top_k=1,
                                 mesh=mesh_arg)
        r0 = b.submit(jnp.asarray([1], jnp.int32))
        b.step()
        r1 = b.submit(jnp.asarray([5], jnp.int32))
        done = dict(b.run_until_done())
        return np.stack([done[r0], done[r1]])

    np.testing.assert_array_equal(run(None), run(mesh))

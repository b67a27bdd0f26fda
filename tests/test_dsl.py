"""DSL interpreter tests: parser, node semantics, generated model configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.dsl import ConfigurableModule, parse_layer, parse_layers
from hifigan_tpu.dsl.classifiers import (
    generate_hunters_config_by_example,
    generate_keepers_config_by_example,
)
from hifigan_tpu.dsl.static_configs import (
    get_decaying_block,
    get_discriminator_config,
    get_generator_configs,
)


def build(cfg, *shapes, rngs=None, dtype=jnp.float32, seed=0):
    mod = ConfigurableModule(config=cfg)
    xs = [jnp.asarray(np.random.default_rng(seed + i).standard_normal(s), dtype) for i, s in enumerate(shapes)]
    init_rngs = {"params": jax.random.PRNGKey(0)}
    if rngs:
        init_rngs.update(rngs)
    variables = mod.init(init_rngs, *xs)
    out = mod.apply(variables, *xs, rngs=rngs)
    return out, variables, mod, xs


def test_parse_layer():
    types, params = parse_layer("res.1|conv.1,sub_res:1,3,3,1,1,1e-00")
    assert types == ["res.1|conv.1", "sub_res"]
    assert params == [1, 3, 3, 1, 1, 1.0]
    assert len(parse_layers(["a:1", "b:2,3"])) == 2


def test_sequential_and_activations():
    out, _, _, _ = build([("tanh",), ("sigmoid",)], (2, 8, 4))
    assert out.shape == (2, 8, 4)
    assert (np.asarray(out) > 0).all()


def test_conv_node_shapes():
    out, variables, _, _ = build(("conv", (4, 8, 3, 1, 1, 1, 0.01)), (2, 16, 4))
    assert out.shape == (2, 16, 8)
    # weight-normed params present
    leaf_names = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("g" in str(p) for p, _ in leaf_names)


def test_conv_norm_none_init_std():
    out, variables, _, _ = build(("conv", (8, 128, 3, 1, 1, 1, 0.05, "none")), (2, 16, 8))
    kern = variables["params"]["m_conv"]["kernel"]
    assert abs(float(jnp.std(kern)) - 0.05) < 0.01  # init_weights std honoured


def test_conv_stride_and_rechannel():
    out, _, _, _ = build(("conv", (4, 8, 5, 2, 1, 1, 0.01)), (2, 16, 4))
    assert out.shape == (2, 8, 8)
    out, _, _, _ = build(("conv_rech", (4, 6, 5, None, 1, 1, 0.01)), (2, 12, 4))
    # stride=None -> 6//gcd(4,6)=3; conv out channels 12, T'=4 -> rechannel 6
    assert out.shape[2] == 6


def test_trans_node_upsamples():
    out, _, _, _ = build(("trans", (4, 2, 6, 3, 1, 1, 0.01)), (2, 8, 4))
    assert out.shape == (2, 24, 2)


def test_roll_unroll_roundtrip():
    x = np.random.default_rng(0).standard_normal((2, 12, 3)).astype(np.float32)
    out, _, _, _ = build([("roll", (4,)), ("unroll", 4)], (2, 12, 3))
    assert out.shape == (2, 12, 3)
    mod = ConfigurableModule(config=[("roll", (4,)), ("unroll", 4)])
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)


def test_shuffle_unshuffle_inverse():
    x = np.arange(2 * 4 * 6, dtype=np.float32).reshape(2, 4, 6)
    mod = ConfigurableModule(config=[("shuffle", 3), ("unshuffle", 3)])
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x)


def test_split_merge_chunk():
    out, _, _, _ = build([("chunk", 2), ("merge",)], (2, 8, 6))
    assert out.shape == (2, 8, 6)
    out, _, _, _ = build([("split", {"a": 2, "b": 4}), ("merge_dict",)], (2, 8, 6))
    assert out.shape == (2, 8, 6)
    out, _, _, _ = build(("split", 3), (2, 8, 6))
    assert isinstance(out, tuple) and len(out) == 2


def test_repl_avg_ch_one_hot():
    out, _, _, _ = build(("repl", 3), (2, 8, 2))
    assert out.shape == (2, 8, 6)
    out, _, _, _ = build(("avg_ch",), (2, 8, 6))
    assert out.shape == (2, 8, 1)
    mod = ConfigurableModule(config=("one_hot", (5, 1)))
    labels = jnp.asarray([[0, 3, 4], [1, 2, 0]])
    v = mod.init(jax.random.PRNGKey(0), labels)
    y = mod.apply(v, labels)
    assert y.shape == (2, 3, 5)


def test_pool_nodes():
    out, _, _, _ = build(("pool", (4, 2)), (2, 16, 3))
    assert out.shape[1] == 9  # torch AvgPool1d(4,2,pad=2) on T=16
    out, _, _, _ = build(("poold", (3, 1, 2)), (2, 16, 3))
    assert out.shape[2] == 3


def test_res_sub_res_valve():
    cfg = ("res", ("conv", (4, 4, 3, 1, 1, 1, 0.01)))
    out, _, _, _ = build(cfg, (2, 8, 4))
    assert out.shape == (2, 8, 4)
    out, variables, mod, xs = build(("valve", 0.5), (2, 8, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs[0]) * 0.5)
    assert "valves" in variables
    # valve ratio is a mutable leaf: zero it and the output gates fully
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, variables["valves"])
    y = mod.apply({**variables, "valves": zeroed}, *xs)
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_noise_node():
    out, _, _, _ = build(
        ("noise", 4), (2, 8, 2), rngs={"noise": jax.random.PRNGKey(42)}
    )
    assert out.shape == (2, 8, 4)
    assert float(jnp.std(out)) > 0.5


def test_mel_node():
    out, _, _, _ = build(("mel", (22050, 8, 64, 16)), (2, 128, 1))
    assert out.shape[2] == 8  # mels channels-last


def test_fusion_sum():
    cfg = ("fusion", [("tanh",), ("sigmoid",)])
    out, _, _, _ = build(cfg, (2, 8, 4))
    assert out.shape == (2, 8, 4)
    cfg = ("sum", [("tanh",), ("sigmoid",)])
    out, _, _, _ = build(cfg, (2, 8, 4))
    assert out.shape == (2, 8, 4)


def test_fmap_capture():
    cfg = (
        "fmap",
        (
            [
                ("conv", (4, 4, 3, 1, 1, 1, 0.01), ["grab"]),
                ("tanh",),
                ("conv", (4, 4, 3, 1, 1, 1, 0.01), ["other"]),
            ],
            ["grab"],
        ),
    )
    out, _, _, _ = build(cfg, (2, 8, 4))
    assert set(out.keys()) == {"output", "features"}
    assert len(out["features"]) == 1
    assert out["features"][0].shape == (2, 8, 4)


def test_ensemble_mean_variance():
    cfg = ("ensemble", [("conv", (4, 4, 3, 1, 1, 1, 0.01)) for _ in range(3)])
    out, _, _, _ = build(cfg, (2, 8, 4))
    assert set(out.keys()) == {"mean", "variance"}
    assert out["mean"].shape == (2, 8, 4)
    assert (np.asarray(out["variance"]) >= 0).all()


def test_recursive_dict():
    cfg = ("recursive", {"a": ("tanh",), "b": ("sigmoid",)})
    mod = ConfigurableModule(config=cfg)
    x = {"a": jnp.ones((2, 4, 2)), "b": jnp.zeros((2, 4, 2))}
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert set(y.keys()) == {"a", "b"}


def test_decaying_block():
    cfg = get_decaying_block(0.5, "skip", "anti", 4, ("conv", (4, 4, 3, 1, 1, 1, 0.01)))
    out, variables, _, _ = build(cfg, (2, 8, 4), rngs={"noise": jax.random.PRNGKey(7)})
    assert out.shape == (2, 8, 4)
    assert "valves" in variables


def test_generated_autoencoder_roundtrip():
    """Full generator config from layer strings: wav -> {content,style} split
    embedding -> wav (reference static_configs.get_generator_configs)."""
    layers = parse_layers(
        ["res.1,none:1,3,1,1,1,1e-00", "res.1,sub_res:1,3,2,1,1,1e-00", "res.1|conv.1,sub_res:2,3,3,1,1,1e-00"]
    )
    strides = [lp[2] for _lt, lp in layers]
    embedding_size = int(np.prod(strides))
    cfgs = get_generator_configs(layers, expansion_size=2, embedding_size=embedding_size)

    enc = ConfigurableModule(config=cfgs["encoder"])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 24, 1)), jnp.float32)
    venc = enc.init(jax.random.PRNGKey(0), x)
    emb = enc.apply(venc, x)
    assert isinstance(emb, dict) and set(emb.keys()) == {"content", "style"}
    total_ch = emb["content"].shape[2] + emb["style"].shape[2]
    assert total_ch == 2 * embedding_size

    dec = ConfigurableModule(config=cfgs["decoder"])
    vdec = dec.init(jax.random.PRNGKey(1), emb)
    wav = dec.apply(vdec, emb)
    assert wav.shape == (2, 24, 1)


def test_generated_discriminator():
    layers = parse_layers(["roll:1,5,1", "roll:2,5,1", "all:3,5,1", "roll:4,3,1"])
    cfg = get_discriminator_config(layers, expansion_size=1, ensemble_size=2)
    out, _, _, _ = build(cfg, (2, 24, 1))
    assert set(out.keys()) == {"output", "features"}
    assert set(out["output"].keys()) == {"mean", "variance"}


def test_keepers_hunters_configs():
    # grouped example labels: {group: {label: class-values}} (the dataset's
    # grouped_labels structure, ref multilabel_wave_dataset.py:33-40)
    example = {
        "content": {"sex": [0, 1], "sad": [0, 1, 2]},
        "style": {"noise": [0, 1], "codec": [0, 1, 2, 3]},
    }
    layers = parse_layers(["conv:6,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"])
    keepers = generate_keepers_config_by_example(4, example, layers=layers)
    hunters = generate_hunters_config_by_example(4, example, layers=layers)
    assert set(keepers.keys()) == {"content", "style"}

    mod = ConfigurableModule(config=keepers["content"])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 4)), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    # ensemble of classifiers -> {'mean': {'content': {label: probs}}}
    assert set(y.keys()) == {"mean", "variance"}
    probs = y["mean"]["content"]
    assert set(probs.keys()) == {"sex", "sad"}
    assert probs["sex"].shape == (2, 8, 2)
    np.testing.assert_allclose(np.asarray(probs["sex"]).sum(-1), 1.0, atol=1e-4)

    # hunters classify the OTHER group
    hm = ConfigurableModule(config=hunters["content"])
    vh = hm.init(jax.random.PRNGKey(0), x)
    yh = hm.apply(vh, x)
    assert set(yh["mean"].keys()) == {"style"}


def test_valve_decay_callback_updates_tagged_ratios():
    from hifigan_tpu.callbacks.valves import ValveDecayCallback
    from hifigan_tpu.dsl.static_configs import get_decaying_block

    cfg = get_decaying_block(1.0, "skip", "anti", 4, ("conv", (4, 4, 3, 1, 1, 1, 0.01)))
    mod = ConfigurableModule(config=cfg)
    x = jnp.zeros((1, 8, 4))
    variables = mod.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    assert "valves" in variables
    names = list(variables["valves"].keys())
    assert any("skip" in n for n in names) and any("anti" in n for n in names)

    cb = ValveDecayCallback(
        {"skip": {"anti": "anti", "start": 10, "limit": 100, "decay": 0.9, "anti_decay": 0.9}},
        valves_steps=1,
    )
    # before start: skip ratio 1, anti ratio 1
    v0 = cb.update_valves(variables, global_step=0)
    for name, leaf in v0["valves"].items():
        np.testing.assert_allclose(float(leaf), 1.0)
    # mid-schedule: skip decays, anti = 1 - decay^(t-start)
    v50 = cb.update_valves(variables, global_step=50)
    skip_val = [float(l) for n, l in v50["valves"].items() if "skip" in n][0]
    anti_val = [float(l) for n, l in v50["valves"].items() if "anti" in n][0]
    np.testing.assert_allclose(skip_val, 0.9 ** 40, rtol=1e-5)
    np.testing.assert_allclose(anti_val, 1 - 0.9 ** 40, rtol=1e-5)
    # past limit: both 0
    v200 = cb.update_valves(variables, global_step=200)
    for name, leaf in v200["valves"].items():
        np.testing.assert_allclose(float(leaf), 0.0)


def test_sniffer_one_hot_false_ref_exact_variant():
    """The reference's shipped sniffer default (one_hot=False,
    label_bias_sniffer.py:84) feeds integer label tensors straight into
    convs; the config variant exists behind the flag — no one-hot input
    layer — and runs on (float-cast) label input."""
    from hifigan_tpu.dsl.static_configs import generate_sniffers_configs_by_example

    example = {
        "content": {"sex": [0, 1], "sad": [0, 1, 2]},
        "style": {"noise": [0, 1], "codec": [0, 1, 2, 3]},
    }
    layers = parse_layers(["conv:6,3,1,1,1,1e-00", "conv:x,3,1,1,1,1e-00"])
    with_oh = generate_sniffers_configs_by_example(example, layers=layers, one_hot=True)
    without = generate_sniffers_configs_by_example(example, layers=layers, one_hot=False)
    assert repr(with_oh["content"]).count("one_hot") > 0
    assert "one_hot" not in repr(without["content"])

    mod = ConfigurableModule(config=without["content"])
    labels = {
        "sex": jnp.asarray(np.random.default_rng(0).integers(0, 2, (2, 8)), jnp.float32)[..., None],
        "sad": jnp.asarray(np.random.default_rng(1).integers(0, 3, (2, 8)), jnp.float32)[..., None],
    }
    v = mod.init(jax.random.PRNGKey(0), labels)
    y = mod.apply(v, labels)
    assert set(y.keys()) == {"mean", "variance"}


def test_ensemble_heterogeneous_unrolled():
    """Ensembles with DIFFERENT member configs take the unrolled path and
    still return mean/variance over members."""
    cfg = ("ensemble", [
        ("conv", (4, 4, 3, 1, 1, 1, 0.01)),
        ("conv", (4, 4, 5, 1, 1, 1, 0.01)),  # different kernel size
    ])
    out, variables, _, _ = build(cfg, (2, 8, 4))
    assert set(out.keys()) == {"mean", "variance"}
    assert out["mean"].shape == (2, 8, 4)
    # unrolled path: per-member param subtrees (no stacked _ens module)
    names = " ".join(str(k) for k in variables["params"].keys())
    assert "_e0" in names and "_e1" in names


def test_ensemble_vmapped_matches_unrolled():
    """The vmapped homogeneous path computes the same mean/variance as an
    unrolled evaluation of the same stacked member params."""
    member = ("conv", (4, 4, 3, 1, 1, 1, 0.01))
    mod = ConfigurableModule(config=("ensemble", [member, member, member]))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 4)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)

    # manual reference: apply the single-member module with each param slice
    single = ConfigurableModule(config=member)
    sx = single.init(jax.random.PRNGKey(1), x)
    stacked = variables["params"]
    leaves, treedef = jax.tree_util.tree_flatten(stacked)
    outs = []
    for i in range(3):
        member_params = jax.tree_util.tree_unflatten(treedef, [l[i] for l in leaves])
        # re-key the stacked subtree to the single module's param structure
        flat_single = jax.tree_util.tree_leaves(sx["params"])
        flat_member = jax.tree_util.tree_leaves(member_params)
        assert [l.shape for l in flat_member] == [l.shape for l in flat_single]
        rebuilt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(sx["params"]), flat_member
        )
        outs.append(np.asarray(single.apply({"params": rebuilt}, x)))
    stacked_out = np.stack(outs, axis=0)
    np.testing.assert_allclose(np.asarray(out["mean"]), stacked_out.mean(0), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["variance"]), stacked_out.var(0, ddof=1), atol=1e-5, rtol=1e-5
    )


def test_valve_decay_inside_vmapped_ensemble():
    """Valves inside a vmapped ensemble are BROADCAST (shared across
    members), so the decay callback's schedule rewrite keeps working across
    repeated applies (regression: stacked (n,) valves + a 0-d rewrite broke
    the next vmapped unstack)."""
    from hifigan_tpu.callbacks.valves import ValveDecayCallback

    member = get_decaying_block(1.0, "skip", "anti", 4, ("conv", (4, 4, 3, 1, 1, 1, 0.01)))
    mod = ConfigurableModule(config=("ensemble", [member, member]))
    x = jnp.zeros((1, 8, 4))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = mod.init(rngs, x)
    assert "valves" in variables

    cb = ValveDecayCallback(
        {"skip": {"anti": "anti", "start": 0, "limit": 100, "decay": 0.9, "anti_decay": 0.9}},
        valves_steps=1,
    )
    v50 = cb.update_valves(variables, global_step=50)
    # shapes preserved exactly -> the rewritten tree still applies cleanly
    for (k0, l0), (k1, l1) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables["valves"]), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(v50["valves"]), key=lambda kv: str(kv[0])),
    ):
        assert l0.shape == l1.shape
    out = mod.apply(
        {**variables, "valves": v50["valves"]}, x, rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert np.all(np.isfinite(np.asarray(out["mean"])))


def test_legacy_unrolled_ensemble_checkpoint_restacks():
    """Checkpoints saved with ensemble_impl='unroll' (flat {base}_e{i}_*
    submodules) restore into the vmapped {base}_ens layout via
    restack_legacy_ensembles — same params, same outputs."""
    from flax import serialization

    from hifigan_tpu.utils.pytree import restack_legacy_ensembles

    member = ("conv", (4, 4, 3, 1, 1, 1, 0.01))
    cfg = ("ensemble", [member, member, member])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 4)), jnp.float32)

    legacy_mod = ConfigurableModule(config=cfg, ensemble_impl="unroll")
    legacy_vars = legacy_mod.init(jax.random.PRNGKey(0), x)
    legacy_out = legacy_mod.apply(legacy_vars, x)
    saved = serialization.msgpack_restore(
        serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, serialization.to_state_dict(legacy_vars))
        )
    )

    vmap_mod = ConfigurableModule(config=cfg)  # ensemble_impl='vmap' default
    template = vmap_mod.init(jax.random.PRNGKey(1), x)
    migrated = restack_legacy_ensembles(saved, serialization.to_state_dict(template))
    restored = serialization.from_state_dict(template, migrated)
    vmap_out = vmap_mod.apply(restored, x)

    np.testing.assert_allclose(
        np.asarray(vmap_out["mean"]), np.asarray(legacy_out["mean"]), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vmap_out["variance"]), np.asarray(legacy_out["variance"]), atol=1e-5, rtol=1e-5
    )


def test_discriminator_conv_impl_folded_parity():
    """conv_impl='folded' (time-fold lowering of the narrow stride-1 convs,
    ops.conv.conv1d_time_folded) computes the identical discriminator:
    same param tree, same outputs, same grads."""
    layers = parse_layers(["roll:1,5,1", "roll:2,5,2", "all:3,5,1", "roll:4,3,1"])
    cfg = get_discriminator_config(layers, expansion_size=1, ensemble_size=2)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 144, 1)), jnp.float32
    )
    m_ref = ConfigurableModule(config=cfg)
    m_fold = ConfigurableModule(config=cfg, conv_impl="folded")
    v = m_ref.init({"params": jax.random.PRNGKey(0)}, x)
    v2 = m_fold.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(v, m):
        out = m.apply(v, x)
        return sum(
            jnp.sum(jnp.abs(leaf))
            for leaf in jax.tree_util.tree_leaves(out["output"])
        ) + 0.1 * sum(
            jnp.mean(jnp.abs(f))
            for f in jax.tree_util.tree_leaves(out["features"])
        )

    lr, gr = jax.value_and_grad(loss)(v, m_ref)
    lf, gf = jax.value_and_grad(loss)(v, m_fold)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gr),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def _member_fusable_disc_config(ensemble_size=2):
    """A small discriminator config the member pattern-matcher ACCEPTS
    (asserted — parse_member silently falls back on rejected subtrees,
    which would make the fused-path parity tests vacuous; the original
    round-3 test config was rejected with 'head0 channels' and tested
    nothing)."""
    from hifigan_tpu.dsl.fused_member import parse_member
    from hifigan_tpu.dsl.normalize import normalize_config

    layers = parse_layers(
        ["roll:1,9,1", "roll:1,5,2", "roll:2,5,2", "all:3,5,2", "roll:4,3,1"]
    )
    cfg = get_discriminator_config(
        layers, expansion_size=1, ensemble_size=ensemble_size
    )
    found = []

    def walk(c):
        if isinstance(c, tuple):
            if len(c) >= 2 and c[0] == "#node" and c[1] == "pfmap":
                found.append(c[2])
                return
            for s in c:
                if isinstance(s, tuple):
                    walk(s)

    walk(normalize_config(cfg))
    plan = parse_member(found[0], "t")  # raises StreamUnsupported if drifted
    assert len(plan.blocks) == 3
    return cfg


def test_discriminator_member_impl_fused_parity():
    """member_impl='fused_interpret' (whole-member Pallas stream-graph
    lowering, dsl/fused_member.py) computes the identical discriminator:
    same param tree, same outputs/features, same grads — including the
    rechannel transitions, roll/mel raw branches, residuals and pfmap heads
    of the all-in-one family."""
    cfg = _member_fusable_disc_config()
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 144, 1)), jnp.float32
    )
    m_ref = ConfigurableModule(config=cfg, mel_sampling_rate_override=16000,
                               update_spectral=True)
    m_fused = ConfigurableModule(config=cfg, mel_sampling_rate_override=16000,
                                 update_spectral=True,
                                 member_impl="fused_interpret")
    v = m_ref.init({"params": jax.random.PRNGKey(0)}, x,
                   mutable=["params", "spectral", "valves"])
    v2 = m_fused.init({"params": jax.random.PRNGKey(0)}, x,
                      mutable=["params", "spectral", "valves"])
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(v, m):
        out = m.apply(v, x, mutable=["spectral"])[0]
        return sum(
            jnp.sum(jnp.abs(leaf))
            for leaf in jax.tree_util.tree_leaves(out["output"])
        ) + 0.1 * sum(
            jnp.mean(jnp.abs(f))
            for f in jax.tree_util.tree_leaves(out["features"])
        )

    lr, gr = jax.value_and_grad(loss)(v, m_ref)
    lf, gf = jax.value_and_grad(loss)(v, m_fused)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gr),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_generator_stream_impl_fused_parity():
    """stream_impl='fused_interpret' (generic stream-fusion pass,
    dsl/stream_fusion.py) computes the identical encoder/decoder: same param
    trees, same outputs, same grads — covering width-changing convs, res /
    sub_res(pool), repl / avg_ch / sum constant edges, and the XLA fallback
    for rolls and the wide core level."""
    from hifigan_tpu.dsl.static_configs import get_generator_configs

    layers = parse_layers([
        "res.1,none:1,3,1,1,1,1e-00",
        "res.1|conv.1,sub_res:1,3,3,1,1,1e-00",
        "res.1|conv.1,sub_res:3,3,5,1,1,1e-00",
    ])
    g = get_generator_configs(layers, expansion_size=2, embedding_size=15)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 150, 1)), jnp.float32
    )
    enc_i = ConfigurableModule(config=g["encoder"])
    enc_f = ConfigurableModule(config=g["encoder"], stream_impl="fused_interpret")
    dec_i = ConfigurableModule(config=g["decoder"])
    dec_f = ConfigurableModule(config=g["decoder"], stream_impl="fused_interpret")
    v = enc_i.init(jax.random.PRNGKey(0), x, mutable=["params", "spectral"])
    v2 = enc_f.init(jax.random.PRNGKey(0), x, mutable=["params", "spectral"])
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    emb = enc_i.apply(v, x)
    dv = dec_i.init(jax.random.PRNGKey(1), emb)
    dv2 = dec_f.init(jax.random.PRNGKey(1), emb)
    assert jax.tree_util.tree_structure(dv) == jax.tree_util.tree_structure(dv2)

    def loss(v, dv, x, enc, dec):
        y = dec.apply(dv, enc.apply(v, x))
        return jnp.sum(y * y)

    li, gi = jax.value_and_grad(loss, argnums=(0, 1, 2))(v, dv, x, enc_i, dec_i)
    lf, gf = jax.value_and_grad(loss, argnums=(0, 1, 2))(v, dv, x, enc_f, dec_f)
    np.testing.assert_allclose(float(lf), float(li), rtol=2e-5)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gi), jax.tree_util.tree_leaves(gf)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_stream_impl_fallback_on_unsupported_nodes():
    """Configs with valves/noise (get_decaying_block) keep interpreter
    semantics under stream_impl='fused_interpret' (node-exact fallback)."""
    from hifigan_tpu.dsl.static_configs import get_decaying_block

    inner = [("conv", (4, 4, 3, 1, 1, 1, 0.01)), ("lrelu", 0.1),
             ("conv", (4, 4, 3, 1, 1, 1, 0.01))]
    cfg = [("conv", (2, 4, 3, 1, 1, 1, 0.01)), ("lrelu", 0.1),
           get_decaying_block(0.5, "skip", "anti", 4, inner),
           ("conv", (4, 2, 3, 1, 1, 1, 0.01)), ("tanh",)]
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 64, 2)), jnp.float32
    )
    m_i = ConfigurableModule(config=cfg)
    m_f = ConfigurableModule(config=cfg, stream_impl="fused_interpret")
    v = m_i.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    v2 = m_f.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    yi = m_i.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    yf = m_f.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yi), atol=2e-5)


def test_stream_impl_res_body_leading_activation():
    """An activation at the head of a res/sub_res body (or after a cut
    rollback) must NOT merge into the residual source's producing op —
    regression for the in-place _act merge (stream_fusion._RunBuilder):
    res(x) must add x, not lrelu(x)."""
    cfg = [
        ("conv", (2, 4, 3, 1, 1, 1, 0.01)),
        ("res", [("lrelu", 0.1), ("conv", (4, 4, 3, 1, 1, 1, 0.01))]),
        ("sub_res", [("lrelu", 0.2), ("conv", (4, 4, 3, 1, 1, 1, 0.01))]),
        ("lrelu", 0.1),
    ]
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 64, 2)), jnp.float32
    )
    m_i = ConfigurableModule(config=cfg)
    m_f = ConfigurableModule(config=cfg, stream_impl="fused_interpret")
    v = m_i.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_f.init({"params": jax.random.PRNGKey(0)}, x)
    )
    yi = m_i.apply(v, x)
    yf = m_f.apply(v, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yi), atol=2e-5)


def test_discriminator_weight_grads_false_input_parity():
    """weight_grads=False on a fused-member discriminator (the distill
    trainer's frozen disc_copy pass): grads wrt the INPUT audio match the
    interpreter exactly while the backward kernels skip every weight-grad
    dot (param cotangents become declared-zero)."""
    cfg = _member_fusable_disc_config()
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 144, 1)), jnp.float32
    )
    m_ref = ConfigurableModule(config=cfg, mel_sampling_rate_override=16000)
    m_nodw = ConfigurableModule(config=cfg, mel_sampling_rate_override=16000,
                                member_impl="fused_interpret",
                                weight_grads=False)
    v = m_ref.init({"params": jax.random.PRNGKey(0)}, x,
                   mutable=["params", "spectral", "valves"])

    def loss(x, m):
        out = m.apply(v, x, mutable=["spectral"])[0]
        return sum(
            jnp.sum(jnp.abs(leaf))
            for leaf in jax.tree_util.tree_leaves(out["output"])
        ) + 0.1 * sum(
            jnp.mean(jnp.abs(f))
            for f in jax.tree_util.tree_leaves(out["features"])
        )

    gr = jax.grad(loss)(x, m_ref)
    gf = jax.grad(loss)(x, m_nodw)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-3, atol=2e-4)
    # param cotangents through the declared-frozen module are zero
    gp = jax.grad(
        lambda vv: m_nodw.apply(vv, x, mutable=["spectral"])[0]["output"][
            "mean"]["output"].sum()
    )(v)
    mx = max(
        float(jnp.max(jnp.abs(l)))
        for l in jax.tree_util.tree_leaves(gp["params"])
    )
    assert mx == 0.0

"""Round-3 pending measurement: group time-fold MSD form (fused_zoned) vs
fused_stack, isolated fwd / fwd+bwd + full train step. Flip msd_conv_impl
auto only if zoned wins here."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hifigan_tpu.config import get_config
from hifigan_tpu.models.discriminators import MultiScaleDiscriminator
from hifigan_tpu.train.vocoder import create_train_state, make_train_step

B, T = 16, 8192
y = jax.random.normal(jax.random.PRNGKey(1), (B, T), jnp.float32) * 0.1
yh = jax.random.normal(jax.random.PRNGKey(2), (B, T), jnp.float32) * 0.1


def tree_sum(t):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(t))


def bench(tag, fn, *args, iters=30):
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    step = jax.jit(lambda acc, *a: acc + fn(*a))
    acc = step(acc, *args)
    float(acc)
    c = time.perf_counter() - t0
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    print(f"[{tag}] {(time.perf_counter()-t0)/iters*1000:.2f} ms (compile {c:.0f}s)", flush=True)


for impl in ("fused_stack", "fused_zoned"):
    msd = MultiScaleDiscriminator(dtype=jnp.bfloat16, conv_impl=impl)
    variables = msd.init({"params": jax.random.PRNGKey(0)}, y, yh, True)
    params, spectral = variables["params"], variables["spectral"]

    def fwd(a, b, params=params, spectral=spectral, msd=msd):
        out = msd.apply({"params": params, "spectral": spectral}, a, b, True,
                        mutable=["spectral"])[0]
        return tree_sum(out)

    bench(f"MSD_fwd_{impl}", fwd, y, yh)

    fb = jax.grad(lambda p, a, b, spectral=spectral, msd=msd: tree_sum(
        msd.apply({"params": p, "spectral": spectral}, a, b, True,
                  mutable=["spectral"])[0]))
    bench(f"MSD_fwd_bwd_{impl}", lambda a, b, params=params, fb=fb: tree_sum(fb(params, a, b)), y, yh)

# full train step with the zoned MSD
for impl in ("fused_zoned",):
    h = dict(get_config("v1"))
    h["gen_compute_dtype"] = "bfloat16"
    h["disc_compute_dtype"] = "bfloat16"
    h["msd_conv_impl"] = impl
    state = create_train_state(h, jax.random.PRNGKey(0), segment_size=T)
    step = make_train_step(h, donate=False)
    batch = {"audio": y}
    t0 = time.perf_counter()
    s2, m2 = step(state, batch)
    jax.block_until_ready(m2)
    print(f"full step ({impl}) compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    iters = 30
    s = state
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m2 = step(s, batch)
    float(m2["loss_gen_all"])
    print(f"[full_step_{impl}] {(time.perf_counter()-t0)/iters*1000:.2f} ms "
          f"loss_gen={float(m2['loss_gen_all']):.3f}", flush=True)
print("DONE", flush=True)

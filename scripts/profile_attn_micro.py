"""NAR attention micro-profile at Bark-fine shapes [B, 16, 1024, 64].

The fine-stage ablation attributes ~85 ms of the 188 ms forward (B=16)
to attention — 3.5 ms/layer vs a ~0.7 ms half-width-MXU dot roofline —
and the lean no-mask kernel measured the SAME as the general one, so the
cost is not mask passes or scratch. This script splits the kernel's time
between the two dots and the online-softmax VPU work by timing in-kernel
ablations (not valid attention — pure cost attribution):

  plain        the production _kernel_plain (dispatched for bark fine)
  plain512     same, 512x512 tiles (fewer grid steps / rescales)
  noexp        exp replaced by identity (x - m passthrough)
  dotsonly     both dots, softmax replaced by a constant p tile
  xla          materialized-scores XLA attention

Timing: bench.timed_best (scalar-fetch sync, cycled distinct buffers).
"""

import argparse
import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--layers", type=int, default=24,
                    help="repeat count inside one jit (amortizes dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from audiotoken_tpu.ops.flash_attention import _flash_attention_plain
    from bench import timed_best

    print("backend:", jax.default_backend(), flush=True)
    B, H, T, dh = args.batch, args.heads, args.seq, args.dh
    rng = np.random.default_rng(0)
    interp = jax.default_backend() != "tpu"

    def mk(seed):
        r = np.random.default_rng(seed)
        return tuple(
            jnp.asarray(r.standard_normal((B, H, T, dh)) * 0.3, jnp.bfloat16)
            for _ in range(3)
        )

    variants = [mk(s) for s in range(2)]

    def ablation_kernel(q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref,
                        *, mode):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)
        q, k, v = q_ref[:], k_ref[:], v_ref[:]

        @pl.when(ik == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        if mode == "dotsonly":
            p_tile = (s * 1e-6).astype(v.dtype)  # keep data dep, no softmax
            l_ref[:] = l_ref[:] + 1.0
        else:
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            if mode == "noexp":
                p_tile = s - m_new  # identity in place of exp
            else:
                p_tile = jnp.exp(s - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p_tile, axis=-1, keepdims=True)
            p_tile = p_tile.astype(v.dtype)
            m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p_tile, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

        @pl.when(ik == nk - 1)
        def _():
            out_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
                out_ref.dtype)

    def run_ablation(q, k, v, *, mode, tile):
        qf = (q * (dh**-0.5)).reshape(B * H, T, dh)
        kf = k.reshape(B * H, T, dh)
        vf = v.reshape(B * H, T, dh)
        G = 8
        grid = (B * H // G, T // tile, T // tile)
        return pl.pallas_call(
            partial(ablation_kernel, mode=mode),
            grid=grid,
            in_specs=[
                pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, ik, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, tile, dh), lambda bh, iq, ik: (bh, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, T, dh), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((G, tile, 1), jnp.float32),
                pltpu.VMEM((G, tile, 1), jnp.float32),
                pltpu.VMEM((G, tile, dh), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interp,
        )(qf, kf, vf).reshape(B, H, T, dh)

    def onepass_kernel(q_ref, k_ref, v_ref, out_ref):
        # single k-tile per grid step: exact softmax in one pass, no
        # online recurrence (no m/l scratch, no alpha rescales)
        q, k, v = q_ref[:], k_ref[:], v_ref[:]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)

    def run_onepass(q, k, v, *, G):
        qf = (q * (dh**-0.5)).reshape(B * H, T, dh)
        kf = k.reshape(B * H, T, dh)
        vf = v.reshape(B * H, T, dh)
        grid = (B * H // G,)
        return pl.pallas_call(
            onepass_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, T, dh), lambda bh: (bh, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, T, dh), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interp,
        )(qf, kf, vf).reshape(B, H, T, dh)

    def xla_bf16_scores(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh**-0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m).astype(jnp.bfloat16))  # bf16 probs buffer
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        a = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32)
        return (a / jnp.maximum(l, 1e-30)).astype(q.dtype)

    def chain(fn):
        # L chained calls inside one jit: the output of call i perturbs
        # q of call i+1 so XLA cannot CSE, dispatch cost amortized
        def run(q, k, v):
            x = q
            for _ in range(args.layers):
                o = fn(x, k, v)
                x = q + o.astype(q.dtype) * 1e-3
            return jnp.sum(x.astype(jnp.float32))
        return run

    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (dh**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32)

    cases = [
        ("plain ", lambda q, k, v: _flash_attention_plain(
            q, k, v, tile=256, interpret=interp,
            precision=jax.lax.Precision.DEFAULT)),
        *([("plain512", lambda q, k, v: _flash_attention_plain(
            q, k, v, tile=512, interpret=interp,
            precision=jax.lax.Precision.DEFAULT))] if T % 512 == 0 else []),
        ("noexp ", partial(run_ablation, mode="noexp", tile=256)),
        ("dotsonly", partial(run_ablation, mode="dotsonly", tile=256)),
        ("dots512 ", partial(run_ablation, mode="dotsonly", tile=512)),
        ("onepassG2", partial(run_onepass, G=2)),
        ("onepassG4", partial(run_onepass, G=4)),
        ("xla   ", xla_attn),
        ("xla_bf16s", xla_bf16_scores),
    ]
    for name, fn in cases:
        dt = timed_best(jax.jit(chain(fn)), variants)
        per_layer = dt * 1e3 / args.layers
        print(f"{name}: {per_layer:7.3f} ms/layer  ({dt*1e3:7.1f} ms / "
              f"{args.layers} calls)", flush=True)


if __name__ == "__main__":
    main()

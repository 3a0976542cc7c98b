"""Harness for the fused fine-stage head kernel (ops/fine_stage_pallas).

Builds a real FeatRegressNet + synthetic superblock rows at the
change_stride eval scale, runs the fused kernel, and checks the final
(M, 5) regressor outputs against the unfused path (fused expansion
kernel + XLA SegmentedConv/conv/BN/FC), then times both.

Usage: python tools/try_fine_stage.py [--m 2400] [--block 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


LEVELS = ((16, 3), (8, 64), (4, 64), (2, 128))  # (t, C) at change_stride
PSIZE = 16
F = 512


def build_rows(rng, m):
    rows1, rows2 = [], []
    for t, c in LEVELS:
        rows1.append(jnp.asarray(
            rng.standard_normal((m, 4, t, t * c)), jnp.bfloat16))
        rows2.append(jnp.asarray(
            rng.standard_normal((m, 4, t, t * c)), jnp.bfloat16))
    return tuple(rows1), tuple(rows2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2400)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from patch2pix_tpu.models.regressor import FeatRegressNet
    from patch2pix_tpu.ops.fine_stage_pallas import (
        _segment_weights,
        bn_affine,
        fused_fine_head_pallas,
        head_prolog_xla,
    )
    from patch2pix_tpu.ops.patch_expand_pallas import (
        expand_scale_pair_pallas,
        expand_scale_pair_xla,
        output_slice_map,
    )

    rng = np.random.default_rng(0)
    m = args.m
    rows1, rows2 = build_rows(rng, m)
    y1 = jnp.asarray(rng.integers(0, 2 * PSIZE, (m,)), jnp.int32)
    x1 = jnp.asarray(rng.integers(0, 2 * PSIZE, (m,)), jnp.int32)
    y2 = jnp.asarray(rng.integers(0, 2 * PSIZE, (m,)), jnp.int32)
    x2 = jnp.asarray(rng.integers(0, 2 * PSIZE, (m,)), jnp.int32)

    reg = FeatRegressNet(dtype=jnp.bfloat16)
    cs = tuple(c for _, c in LEVELS)
    ds_list = tuple(PSIZE // t for t, _ in LEVELS)

    # init with dummy patches matching the fused-gather layout
    outs0 = expand_scale_pair_xla(
        rows1, rows2, y1, x1, y2, x2, PSIZE, ds_list, jnp.bfloat16)
    smap = output_slice_map(ds_list, cs, PSIZE)
    variables = reg.init(
        jax.random.PRNGKey(0), tuple(outs0), None, train=False,
        slice_map=list(smap),
    )
    # non-trivial BN running stats so the affines actually matter
    def randomize_stats(path, a):
        name = jax.tree_util.keystr(path)
        if "var" in name:
            return jnp.asarray(rng.uniform(0.5, 1.5, a.shape), jnp.float32)
        if "mean" in name:
            return jnp.asarray(rng.uniform(-0.3, 0.3, a.shape), jnp.float32)
        return a

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        randomize_stats, variables["batch_stats"])

    # ---------- unfused reference: fused-expansion + XLA regressor
    @jax.jit
    def unfused(rows1, rows2, y1, x1, y2, x2):
        outs = expand_scale_pair_pallas(
            rows1, rows2, y1, x1, y2, x2, PSIZE, ds_list, jnp.bfloat16,
            False,
        )
        return reg.apply(
            variables, tuple(outs), None, train=False,
            slice_map=list(smap),
        )

    # ---------- fused head + XLA FCs
    p = variables["params"]
    st = variables["batch_stats"]
    w0_segs = tuple(_segment_weights(
        p["conv0"]["kernel"].astype(jnp.bfloat16), cs, jnp.bfloat16))
    wc1 = p["conv1"]["kernel"].astype(jnp.bfloat16).reshape(9, F, F)
    bn0 = bn_affine(p["convbn0"]["scale"], p["convbn0"]["bias"],
                    st["convbn0"]["mean"], st["convbn0"]["var"])
    bn1 = bn_affine(p["convbn1"]["scale"], p["convbn1"]["bias"],
                    st["convbn1"]["mean"], st["convbn1"]["var"])

    @jax.jit
    def fused(rows1, rows2, y1, x1, y2, x2):
        inv1, inv2, partial0 = head_prolog_xla(
            rows1, rows2, y1, x1, y2, x2,
            p["conv0"]["kernel"].astype(jnp.bfloat16), PSIZE,
            jnp.bfloat16,
        )
        pooled = fused_fine_head_pallas(
            rows1[1:], rows2[1:], y1, x1, y2, x2, inv1, inv2, partial0,
            w0_segs, wc1, bn0, bn1,
            PSIZE, jnp.bfloat16, args.block, args.interpret,
        )
        # FC head in XLA, mirroring FeatRegressNet's fc loop
        feat = pooled
        for i, dim in enumerate(reg.fc_dims):
            fp = p[f"fc{i}"]
            feat = (feat.astype(jnp.bfloat16)
                    @ fp["kernel"].astype(jnp.bfloat16)
                    + fp["bias"].astype(jnp.bfloat16))
            s, t = bn_affine(
                p[f"fcbn{i}"]["scale"], p[f"fcbn{i}"]["bias"],
                st[f"fcbn{i}"]["mean"], st[f"fcbn{i}"]["var"])
            feat = (feat.astype(jnp.float32) * s + t).astype(jnp.bfloat16)
            feat = jnp.maximum(feat, 0)
        fo = p["fc_out"]
        return feat.astype(jnp.float32) @ fo["kernel"] + fo["bias"]

    ref = unfused(rows1, rows2, y1, x1, y2, x2)
    got = fused(rows1, rows2, y1, x1, y2, x2)
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    err = np.abs(got - ref)
    scale = np.abs(ref) + 1e-3
    print(f"final (M,5): max abs err {err.max():.4e}  "
          f"max rel {np.max(err / scale):.4e}  "
          f"median abs {np.median(err):.2e}")

    # ---------- timing (in-jit marginal)
    def loopify(body):
        @functools.partial(jax.jit, static_argnums=1)
        def run(a, iters):
            def step(i, carry):
                acc, = carry
                o = body(i)
                return (acc + jnp.sum(o.astype(jnp.float32)) * 1e-9,)

            return jax.lax.fori_loop(0, iters, step, (jnp.float32(0.0),))[0]

        return run

    y1v = y1

    def t_unfused(i):
        return unfused(rows1, rows2, y1v + 0 * i, x1, y2, x2)

    def t_fused(i):
        return fused(rows1, rows2, y1v + 0 * i, x1, y2, x2)

    for name, body in (("unfused", t_unfused), ("fused", t_fused)):
        run = loopify(body)

        def timed(iters):
            float(run(jnp.float32(0), iters))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(jnp.float32(0), iters))
                best = min(best, time.perf_counter() - t0)
            return best

        tt = (timed(8) - timed(2)) / 6
        print(f"{name:10s} {tt * 1e3:8.3f} ms per stage call (M={m})")


if __name__ == "__main__":
    main()

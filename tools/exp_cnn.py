"""Standalone CNN timing experiments on the TPU (ligand-box rep net).

Times rep-net variants on the resplat sweep's per-chunk input
``[16, 40, 40, 40, 11]`` to find the fastest architecture/impl.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from deeplocalproteindocking_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, LS, CIN = 16, 40, 11


class Stack(nn.Module):
    features: tuple
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        k = (self.kernel,) * 3
        for i, f in enumerate(self.features):
            x = nn.Conv(f, k, padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            if i + 1 < len(self.features):
                x = nn.elu(x)
        return x.astype(jnp.float32)


def time_fn(fn, x, n=30):
    y = fn(x)
    np.asarray(jax.tree.leaves(y)[0][0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(x)
    np.asarray(jax.tree.leaves(y)[0][0, 0, 0, 0])
    return (time.perf_counter() - t0) / n / B * 1e3   # ms per rotation


def main():
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (B, LS, LS, LS, CIN), jnp.float32)

    cases = {
        "f32_(32,32,16)": ((32, 32, 16), jnp.float32),
        "bf16_(32,32,16)": ((32, 32, 16), jnp.bfloat16),
        "bf16_(16,16,16)": ((16, 16, 16), jnp.bfloat16),
        "bf16_(32,16)": ((32, 16), jnp.bfloat16),
        "bf16_(48,16)": ((48, 16), jnp.bfloat16),
        "bf16_(128,16)": ((128, 16), jnp.bfloat16),
    }
    for name, (feats, dt) in cases.items():
        m = Stack(features=feats, dtype=dt)
        p = m.init(jax.random.key(1), x[:1, :8, :8, :8])
        f = jax.jit(lambda xx, pp=p, mm=m: mm.apply(pp, xx))
        ms = time_fn(f, x)
        print(f"{name:>18}: {ms:7.3f} ms/rot")

    # relu instead of elu
    class StackR(nn.Module):
        features: tuple = (32, 32, 16)
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, xx):
            xx = xx.astype(self.dtype)
            for i, ff in enumerate(self.features):
                xx = nn.Conv(ff, (3, 3, 3), padding="SAME",
                             dtype=self.dtype, name=f"conv{i}")(xx)
                if i + 1 < len(self.features):
                    xx = nn.relu(xx)
            return xx.astype(jnp.float32)

    m = StackR()
    p = m.init(jax.random.key(1), x[:1, :8, :8, :8])
    f = jax.jit(lambda xx, pp=p, mm=m: mm.apply(pp, xx))
    print(f"{'relu_bf16_(32,32,16)':>18}: {time_fn(f, x):7.3f} ms/rot")

    # conv2d z-decomposition: 3D conv = sum_dz conv2d(z-shifted)
    def conv2d_decomp(xx, ws, bs, dt=jnp.bfloat16):
        xx = xx.astype(dt)
        for li, (w, b) in enumerate(zip(ws, bs)):
            Bz, X, Y, Z, C = xx.shape
            xp = jnp.pad(xx, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
            xt = jnp.moveaxis(xp, 3, 1)              # [B, Z+2, X, Y, C]
            acc = None
            for dz in range(3):
                sl = xt[:, dz:dz + Z].reshape(Bz * Z, X, Y, C)
                o = jax.lax.conv_general_dilated(
                    sl, w[dz].astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                acc = o if acc is None else acc + o
            acc = acc + b
            xx = acc.reshape(Bz, Z, X, Y, -1)
            xx = jnp.moveaxis(xx, 1, 3).astype(dt)
            if li + 1 < len(ws):
                xx = nn.elu(xx)
        return xx.astype(jnp.float32)

    feats = (32, 32, 16)
    ws, bs = [], []
    cin = CIN
    key = jax.random.key(2)
    for ff in feats:
        key, k1 = jax.random.split(key)
        ws.append(jax.random.normal(k1, (3, 3, 3, cin, ff),
                                    jnp.float32) * 0.1)
        bs.append(jnp.zeros((ff,), jnp.float32))
        cin = ff
    f = jax.jit(lambda xx: conv2d_decomp(xx, ws, bs))
    print(f"{'c2d_bf16_(32,32,16)':>18}: {time_fn(f, x):7.3f} ms/rot")

    # z-stack trick: 3^3 conv == (3,3,1) conv over z-stacked channels;
    # x stays [B, X, Y, Z, C] (no transpose), kernel dim X folds first.
    def zstack_conv(xx, ws, bs, dt=jnp.bfloat16):
        xx = xx.astype(dt)
        for li, (w, b) in enumerate(zip(ws, bs)):
            Bz, X, Y, Z, C = xx.shape
            xp = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            x3 = jnp.concatenate([xp[:, dx:dx + X] for dx in range(3)],
                                 axis=-1)          # [B, X, Y, Z, 3C]
            # w [3, 3, 3, C, F] -> [(dx c), 3, 3, F] -> kernel (3,3,1)?
            wk = jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(
                3 * C, 3, 3, w.shape[-1])          # [3C, ky, kz, F]
            wk = jnp.transpose(wk, (1, 2, 0, 3))   # [ky, kz, 3C, F]
            o = jax.lax.conv_general_dilated(
                x3.reshape(Bz * X, Y, Z, 3 * C), wk.astype(dt),
                (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            xx = (o + b).reshape(Bz, X, Y, Z, -1).astype(dt)
            if li + 1 < len(ws):
                xx = nn.elu(xx)
        return xx.astype(jnp.float32)

    f = jax.jit(lambda xx: zstack_conv(xx, ws, bs))
    print(f"{'zstk_bf16_(32,32,16)':>18}: {time_fn(f, x):7.3f} ms/rot")


if __name__ == "__main__":
    main()

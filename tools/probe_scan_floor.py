#!/usr/bin/env python3
"""Decompose the per-scan-step fixed cost ("nop floor") seen at small
geometry by tools/profile_stages.py: 0.24 ms/step at CIF where the whole
pipeline is 0.60 ms.  Variants add one suspect at a time:

  empty      scan body = counter increment, no xs, no big carry
  xs_slice   + consume xs (the (F,H,W) frame stacks), checksum one row
  recon      + carry three pass-through recon planes
  seqbuf     + carry the (seq_cap,) uint32 sequence buffer untouched
  seqbuf_rw  + read-modify-write one word of the buffer per step
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

_env = __import__("os").environ
W = int(_env.get("PROF_W", "352"))
H = int(_env.get("PROF_H", "288"))
NF = int(_env.get("PROF_NF", "96"))
SEQ_WORDS = int(_env.get("PROF_SEQ_WORDS", "2097152"))


def make(variant):
    def body(carry, xs):
        py, pu, pv, sw, acc = carry
        if variant == "empty":
            acc = acc + 1
        else:
            yy, uu, vv = xs
            acc = acc + yy[0, :256].astype(jnp.int32).sum()
        if variant in ("recon", "seqbuf", "seqbuf_rw"):
            py = jnp.roll(py, 1, axis=0)   # force a real new value each step
        if variant == "seqbuf_rw":
            sw = sw.at[0].set(sw[0] + acc.astype(jnp.uint32))
        return (py, pu, pv, sw, acc), None

    @jax.jit
    def run(fy, fu, fv, py, pu, pv, salt):
        nbuf = SEQ_WORDS if variant in ("seqbuf", "seqbuf_rw") else 8
        sw = jnp.zeros((nbuf,), jnp.uint32)
        c0 = (py, pu, pv, sw, salt)
        xs = None if variant == "empty" else (fy, fu, fv)
        c, _ = jax.lax.scan(body, c0, xs, length=NF)
        return c[4], c[3][0]

    return run


def main():
    rng = np.random.default_rng(0)
    fy = jnp.asarray(rng.integers(0, 255, (NF, H, W), dtype=np.uint8))
    fu = jnp.asarray(rng.integers(0, 255, (NF, H, W), dtype=np.uint8))
    fv = jnp.asarray(rng.integers(0, 255, (NF, H, W), dtype=np.uint8))
    py = jnp.zeros((H, W), jnp.uint8)
    pc = jnp.zeros((H // 2, W // 2), jnp.uint8)
    jax.block_until_ready((fy, fu, fv))
    for variant in ("empty", "xs_slice", "recon", "seqbuf", "seqbuf_rw"):
        run = make(variant)
        out = run(fy, fu, fv, py, pc, pc, jnp.int32(0))
        _ = int(out[0])
        ts = []
        for r in range(5):
            t0 = time.perf_counter()
            out = run(fy, fu, fv, py, pc, pc, jnp.int32(r + 1))
            _ = int(out[0])
            ts.append((time.perf_counter() - t0) / NF * 1000)
        ts.sort()
        print(f"{variant:10s}: min {ts[0]:7.4f}  med {ts[2]:7.4f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()

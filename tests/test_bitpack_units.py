"""Unit tests for the device bit-packing primitives against the BitWriter
reference: the budgeted pack tree (with per-level overflow detection) and the
O(frame) sequence append."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpga_mpeg2_encoder_tpu.core.bitstream import BitWriter
from fpga_mpeg2_encoder_tpu.ops import bitpack


def _random_symbols(rng, rows, s, density=0.1):
    lens = np.zeros((rows, s), np.int32)
    mask = rng.random((rows, s)) < density
    lens[mask] = rng.integers(1, 25, mask.sum())
    codes = rng.integers(0, 1 << 24, (rows, s)).astype(np.uint32) \
        & ((1 << np.minimum(lens, 31)) - 1).astype(np.uint32)
    return codes, lens


def _reference_rows(codes, lens):
    out = []
    for r in range(codes.shape[0]):
        bw = BitWriter()
        for c, l in zip(codes[r].tolist(), lens[r].tolist()):
            bw.put(int(c), int(l))
        out.append((bw.to_bytes_aligned(), bw.bit_length))
    return out


@pytest.mark.parametrize("s,cap,budget", [
    (517, 64, 0), (517, 64, 8), (2048, 256, 8), (1000, 128, 4),
])
def test_pack_symbols_matches_bitwriter(rng, s, cap, budget):
    codes, lens = _random_symbols(rng, 6, s)
    w, b, ovf = jax.jit(
        lambda c, l: bitpack.pack_symbols(c, l, cap, budget_bps=budget)
    )(jnp.asarray(codes), jnp.asarray(lens))
    assert not bool(ovf)
    wh, bh = np.asarray(w), np.asarray(b)
    for r, (ref_bytes, ref_bits) in enumerate(_reference_rows(codes, lens)):
        aligned = (ref_bits + 7) & ~7
        assert int(bh[r]) == aligned
        got = wh[r].astype(">u4").tobytes()[: len(ref_bytes)]
        assert got == ref_bytes, f"row {r}"


def test_pack_symbols_budget_overflow_detected(rng):
    """A locally dense row must trip the budget's per-level overflow flag
    rather than silently dropping bits."""
    s = 2048
    codes = np.zeros((2, s), np.uint32)
    lens = np.zeros((2, s), np.int32)
    lens[0, :400] = 24                      # 9600 bits clustered at the front
    codes[0, :400] = 0xABCDEF
    w, b, ovf = bitpack.pack_symbols(jnp.asarray(codes), jnp.asarray(lens),
                                     cap_words=4096, budget_bps=2,
                                     budget_margin=64)
    assert bool(ovf)
    # and the un-budgeted tree packs it fine
    w2, b2, ovf2 = bitpack.pack_symbols(jnp.asarray(codes), jnp.asarray(lens),
                                        cap_words=4096, budget_bps=0)
    assert not bool(ovf2) and int(np.asarray(b2)[0]) == 9600


def test_append_bitstring_matches_bitwriter(rng):
    """Random sequence of appends == one BitWriter stream (bit-for-bit),
    including appends that straddle word boundaries in every phase."""
    cap = 4096
    seq = jnp.zeros((cap,), jnp.uint32)
    seq_bits = jnp.int32(0)
    bw = BitWriter()
    append = jax.jit(bitpack.append_bitstring)
    for _ in range(25):
        nbits = int(rng.integers(1, 900))
        payload = rng.integers(0, 256, (nbits + 7) // 8, dtype=np.uint8)
        # left-justified word buffer of the payload, truncated to nbits
        bits = np.unpackbits(payload)[:nbits]
        for bit in bits.tolist():
            bw.put(int(bit), 1)
        wordbuf = np.zeros(32, np.uint32)
        packed = np.packbits(np.pad(bits, (0, 32 * 32 - nbits)))
        wordbuf = packed.view(">u4").astype(np.uint32)
        seq, seq_bits = append(seq, seq_bits,
                               jnp.asarray(wordbuf), jnp.int32(nbits))
    raw_bits = bw.bit_length
    bw_bytes = bw.to_bytes_aligned()
    got = np.asarray(seq).astype(">u4").tobytes()[: len(bw_bytes)]
    assert int(seq_bits) == raw_bits
    assert got == bw_bytes

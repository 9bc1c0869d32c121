"""Viterbi decoder batching tricks (codeword merging)."""

import numpy as np
def test_merged_codewords_separator_flush():
    """Chaining terminated codewords with 6 large-amplitude virtual-flush
    separator steps decodes bit-identically to independent decodes (the
    ReceiveStep merges the FIC codewords into the MSC Viterbi call this way)."""
    import jax.numpy as jnp
    from tpudab.ops.viterbi import viterbi_decode
    from tpudab.fec.conv import conv_encode
    rng = np.random.default_rng(42)
    n_bits, n_cw = 100, 6
    cws = []
    softs = []
    for i in range(n_cw):
        bits = rng.integers(0, 2, n_bits).astype(np.uint8)
        coded = conv_encode(bits).reshape(-1, 4)  # (n_bits+6, 4) hard bits
        soft = (1.0 - 2.0 * coded.astype(np.float32))
        soft += 0.6 * rng.standard_normal(soft.shape).astype(np.float32)
        cws.append(bits)
        softs.append(soft)
    # independent decodes
    sep_t = n_bits + 6
    batch = np.stack(softs)  # (n_cw, sep_t, 4)
    indep = np.asarray(viterbi_decode(jnp.asarray(batch), n_bits))
    # merged row: cw0, 6xflush(A), cw1, ...
    a = 100.0
    parts = []
    for i, soft in enumerate(softs):
        parts.append(soft)
        if i < n_cw - 1:
            parts.append(np.full((6, 4), a, np.float32))
    merged = np.concatenate(parts, axis=0)[None]  # (1, T, 4)
    dec = np.asarray(viterbi_decode(jnp.asarray(merged), merged.shape[1]))
    stride = sep_t + 6
    for i in range(n_cw):
        np.testing.assert_array_equal(
            dec[0, i * stride: i * stride + n_bits], indep[i],
            err_msg=f"codeword {i} mismatch")


def test_pallas_bytes_matches_scan_pack():
    """viterbi_decode_pallas_bytes (in-kernel 8-bit packing, interpret mode)
    must equal the XLA scan decode + host pack byte-for-byte."""
    import jax.numpy as jnp
    from tpudab.ops.viterbi import viterbi_decode
    from tpudab.ops.viterbi_pallas import viterbi_decode_pallas_bytes
    from tpudab.utils.bits import pack_bits
    rng = np.random.default_rng(7)
    b, n_bits = 8, 256
    soft = rng.standard_normal((b, n_bits + 6, 4)).astype(np.float32)
    ref_bits = np.asarray(viterbi_decode(jnp.asarray(soft), n_bits))
    ref_bytes = pack_bits(ref_bits)
    got = np.asarray(viterbi_decode_pallas_bytes(
        jnp.asarray(soft), n_bits, interpret=True))
    np.testing.assert_array_equal(got, ref_bytes)


def test_pallas_bf16_soft_matches_scan_on_quantized():
    """bf16 soft bits through the Pallas path (bf16 branch-metric matmul,
    f32 path metrics) must decode identically to the XLA scan decoder fed
    the same bf16-quantized soft values."""
    import jax.numpy as jnp
    from tpudab.ops.viterbi import viterbi_decode
    from tpudab.ops.viterbi_pallas import (viterbi_decode_pallas,
                                           viterbi_decode_pallas_bytes)
    from tpudab.utils.bits import pack_bits
    rng = np.random.default_rng(13)
    b, n_bits = 8, 256
    soft = rng.standard_normal((b, n_bits + 6, 4)).astype(np.float32)
    sb = jnp.asarray(soft).astype(jnp.bfloat16)
    ref_bits = np.asarray(viterbi_decode(sb.astype(jnp.float32), n_bits))
    got_bits = np.asarray(viterbi_decode_pallas(sb, n_bits, interpret=True))
    np.testing.assert_array_equal(got_bits, ref_bits)
    got_bytes = np.asarray(viterbi_decode_pallas_bytes(
        sb, n_bits, interpret=True))
    np.testing.assert_array_equal(got_bytes, pack_bits(ref_bits))

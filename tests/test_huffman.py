"""Huffman codec round trips."""

import numpy as np

from onedc_tpu.entropy.huffman import HuffmanCodec, HuffmanCodecOneQP, build_code_table


def test_code_table_prefix_free():
    table = build_code_table([0.5, 0.25, 0.125, 0.125])
    codes = list(table.values())
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a)
    # most probable symbol gets the shortest code
    assert len(table[0]) == min(len(c) for c in codes)


def test_round_trip(rng):
    probs = rng.dirichlet(np.ones(16))
    codec = HuffmanCodecOneQP(probs)
    syms = rng.choice(16, size=500, p=probs)
    data = codec.encode(syms)
    out = codec.decode(data)
    np.testing.assert_array_equal(out, syms)
    # entropy sanity: coded size within 20% of the entropy bound + 1 byte
    ent = -np.sum(probs * np.log2(probs + 1e-12))
    assert len(data) * 8 <= 500 * (ent + 1) * 1.2 + 16


def test_multi_qp(rng):
    codec = HuffmanCodec()
    codec.update_vq({0: [0.9, 0.05, 0.05], 1: [0.25, 0.25, 0.5]})
    syms = [0, 1, 2, 0, 0, 2]
    for qp in (0, 1):
        data = codec.encode(syms, qp)
        np.testing.assert_array_equal(codec.decode(data, qp), syms)


def test_single_symbol_alphabet():
    codec = HuffmanCodecOneQP([1.0])
    data = codec.encode([0, 0, 0])
    np.testing.assert_array_equal(codec.decode(data), [0, 0, 0])

import numpy as np

from sicelore_tpu.utils import dna


def test_encode_decode_roundtrip():
    s = "ACGTNacgt"
    codes = dna.encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    assert dna.decode(codes) == "ACGTNACGT"


def test_revcomp():
    assert dna.revcomp_str("ACGT") == "ACGT"
    assert dna.revcomp_str("AACC") == "GGTT"
    assert dna.revcomp_str("ANT") == "ANT"


def test_encode_batch_padding():
    batch, lens = dna.encode_batch([b"ACG", b"TTTTT"])
    assert batch.shape == (2, 5)
    assert lens.tolist() == [3, 5]
    assert batch[0, 3] == dna.PAD and batch[0, 4] == dna.PAD


def test_pack_kmers_roundtrip():
    seq = "ACGTACGTACGTACGT"
    codes = dna.encode(seq)
    w = dna.pack_kmers(codes[None, :], k=16)[0]
    assert dna.unpack_kmer(int(w), 16) == seq


def test_valid_kmers():
    codes, _ = dna.encode_batch([b"ACGTACGTACGTACGT", b"ACGTACGTACGTACGN"])
    v = dna.valid_kmers(codes)
    assert v.tolist() == [True, False]


def test_phred_roundtrip():
    q = np.array([0, 10, 40], dtype=np.int8)
    assert dna.phred_to_qual(dna.qual_to_phred(q)).tolist() == [0, 10, 40]

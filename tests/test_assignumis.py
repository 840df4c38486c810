"""Step-3 assignumis tests: UMI clustering on a synthetic sorted BAM."""
import numpy as np
import pytest

from sicelore_tpu.core.umicluster import (cluster_group, complete_link_clusters,
                                          myers_ed, pairwise_ed,
                                          single_link_clusters)
from sicelore_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from sicelore_tpu.pipeline import readname
from sicelore_tpu.pipeline.assignumis import AssignUmisPipeline
from sicelore_tpu.utils import dna


def test_myers_ed_scalar():
    assert myers_ed(b"ACGT", b"ACGT") == 0
    assert myers_ed(b"ACGT", b"ACGA") == 1
    assert myers_ed(b"ACGT", b"AGT") == 1
    assert myers_ed(b"ACGT", b"TGCA") == 4
    assert myers_ed(b"", b"ACG") == 3


def test_cluster_group_centers():
    # 3 reads of UMI A (one with 1 sub), singleton far away
    umis = [b"AAAACCCCGGGG", b"AAAACCCCGGGG", b"AAAACCCCGGGT", b"TTTTTTTTTTTT"]
    quals = [30.0, 20.0, 10.0, 30.0]
    cls = cluster_group(umis, quals)
    cls.sort(key=lambda c: -len(c.members))
    assert len(cls) == 2
    assert sorted(cls[0].members) == [0, 1, 2]
    assert cls[0].center == b"AAAACCCCGGGG"  # least-square-sum center
    assert cls[0].from_clustering and not cls[0].is_readseq
    assert cls[1].members == [3] and cls[1].is_readseq


def test_cluster_two_reads_quality():
    umis = [b"AAAACCCCGGGG", b"AAAACCCCGGGT"]
    cls = cluster_group(umis, [10.0, 35.0])
    assert len(cls) == 1 and cls[0].center == b"AAAACCCCGGGT"


def test_complete_vs_single_link():
    # chain A -1- B -1- C: single-link ED1 joins all; complete-link ED2
    # joins all (max pair = 2); complete-link ED1 only joins a pair
    umis = [b"AAAAAAAAAAAA", b"AAAAAAAAAAAT", b"AAAAAAAAAATT"]
    d = pairwise_ed(umis)
    assert len(single_link_clusters(d, 1)) == 1
    assert len(complete_link_clusters(d, 2)) == 1
    assert len(complete_link_clusters(d, 1)) == 2


ADAPTER = "CTACACGACGCTCTTCCGATCT"


def make_scan_read(rng, bc, umi, cdna_len=100, polya=15, umi_err=0):
    """Stranded read + scanfastq-style name (geometry: README.md:396-459)."""
    cdna = "".join("ACGT"[i] for i in rng.integers(0, 4, cdna_len))
    u = umi
    for _ in range(umi_err):
        p = int(rng.integers(0, len(u)))
        u = u[:p] + "ACGT"[int(rng.integers(0, 4))] + u[p + 1:]
    seq = cdna + "A" * polya + dna.revcomp_str(u) + dna.revcomp_str(bc) \
        + dna.revcomp_str(ADAPTER)
    ps = cdna_len
    pe = cdna_len + polya - 1
    ae = cdna_len + polya + len(u) + 16  # first rcAdapter base
    name = readname.encode_name(
        b"rd%d" % int(rng.integers(1e9)), is_fwd=True, ps=ps, pe=pe, ae=ae,
        bc=bc, ed=0, ed_sec=readname.INT_MAX, bc_start=ae - 1, bc_end=ae - 16,
        rank=1, x_seq=seq[ae - 40:ae + 3].encode(), x_qv=30.0)
    return name.decode(), seq


@pytest.fixture()
def sorted_bam(tmp_path):
    rng = np.random.default_rng(3)
    header = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])
    recs = []
    truth = []  # (molecule_id, qname)
    # two cells x two molecules each at distinct loci; 3 reads per molecule
    # with up to 1 UMI error
    loci = [1000, 1000, 5000, 9000]
    CELLA = "AAAACCCCGGGGTTTT"
    CELLB = "TTTTGGGGCCCCAAAA"
    cells = [CELLA, CELLA, CELLB, CELLB]
    for mi in range(4):
        umi = "".join("ACGT"[i] for i in rng.integers(0, 4, 12))
        # one genomic strand per molecule (reads of one molecule all map
        # the same way)
        reverse = bool(mi % 2)
        for r in range(3):
            name, seq = make_scan_read(rng, cells[mi], umi,
                                       cdna_len=100 + mi,
                                       umi_err=(1 if r == 2 else 0))
            bam_seq = dna.revcomp_str(seq) if reverse else seq
            pos = loci[mi] + int(rng.integers(0, 20))
            recs.append(BamRecord(
                qname=name, flag=16 if reverse else 0, ref_id=0, pos=pos,
                mapq=60, cigar=[("M", len(seq))], seq=bam_seq,
                qual=bytes([30]) * len(seq),
                tags=[("GE", "Z", f"GENE{mi//2}")]))
            truth.append((mi, name))
    recs.sort(key=lambda r: r.pos)
    p = tmp_path / "sorted.bam"
    with BamWriter(p, header) as w:
        for r in recs:
            w.write(r)
    return p, dict(truth_pairs=truth)


def test_assignumis_end_to_end(sorted_bam, tmp_path):
    bam, meta = sorted_bam
    out = tmp_path / "out.bam"
    pipe = AssignUmisPipeline()
    stats = pipe.run(bam, out, genecounts_tsv=tmp_path / "genecounts.tsv",
                     umidepths_tsv=tmp_path / "UMIdepths.tsv",
                     log_json=tmp_path / "log.json")
    assert stats.total_records == 12
    assert stats.umi_assigned == 12
    with BamReader(out) as rd:
        by_read = {}
        for r in rd:
            info = readname.parse_name(r.qname)
            by_read[r.qname] = (r.get_tag("BC"), r.get_tag("U8"),
                                r.get_tag("U1"), r.get_tag("UZ"))
    # all 3 reads of each molecule share one U8; the errored read has U1>0
    mols = {}
    for mi, name in meta["truth_pairs"]:
        bc, u8, u1, uz = by_read[name]
        assert bc in ("AAAACCCCGGGGTTTT", "TTTTGGGGCCCCAAAA")
        mols.setdefault(mi, set()).add(u8)
        assert uz is None  # every molecule clustered (3 reads)
    assert all(len(s) == 1 for s in mols.values()), mols
    # distinct molecules got distinct UMIs
    all_umis = [next(iter(s)) for s in mols.values()]
    assert len(set(all_umis)) == 4
    # depth histogram: 4 clusters of depth 3
    depths = (tmp_path / "UMIdepths.tsv").read_text().strip().split("\n")[1:]
    assert depths == ["3\t4"]
    gc = (tmp_path / "genecounts.tsv").read_text().strip().split("\n")[1:]
    parsed = {tuple(l.split("\t")[:2]): int(l.split("\t")[2]) for l in gc}
    assert parsed[("GENE0", "AAAACCCCGGGGTTTT")] == 2
    assert parsed[("GENE1", "TTTTGGGGCCCCAAAA")] == 2


def test_complete_link_nnchain_properties():
    """NN-chain complete-link: (a) matches the naive global-min algorithm
    on unique-distance matrices, (b) cluster diameter <= max_ed always,
    (c) scales to a 3000-UMI group in O(K^2) time."""
    import time

    import numpy as np

    def naive(d, max_ed):
        K = d.shape[0]
        clusters = [[i] for i in range(K)]
        cd = d.astype(np.float64).copy()
        np.fill_diagonal(cd, np.inf)
        active = list(range(K))
        while len(active) > 1:
            sub = cd[np.ix_(active, active)]
            k = int(np.argmin(sub))
            i, j = divmod(k, len(active))
            if sub[i, j] > max_ed:
                break
            ai, aj = active[i], active[j]
            cd[ai, :] = np.maximum(cd[ai, :], cd[aj, :])
            cd[:, ai] = cd[ai, :]
            cd[ai, ai] = np.inf
            clusters[ai].extend(clusters[aj])
            clusters[aj] = []
            active.pop(j)
        return {frozenset(c) for c in clusters if c}

    rng = np.random.default_rng(0)
    for K in (2, 5, 17, 40):
        a = rng.random((K, K)) * 10
        d = np.triu(a, 1) + np.triu(a, 1).T  # unique off-diag distances
        for max_ed in (2.0, 5.0):
            got = {frozenset(c) for c in complete_link_clusters(d, max_ed)}
            assert got == naive(d, max_ed), (K, max_ed)
            for c in got:  # diameter bound
                idx = sorted(c)
                if len(idx) > 1:
                    sub = d[np.ix_(idx, idx)]
                    np.fill_diagonal(sub, 0)
                    assert sub.max() <= max_ed

    # integer-ED matrix with ties: diameter bound must still hold
    di = rng.integers(0, 6, (60, 60))
    di = np.triu(di, 1) + np.triu(di, 1).T
    for c in complete_link_clusters(di, 2):
        if len(c) > 1:
            sub = di[np.ix_(sorted(c), sorted(c))]
            assert sub.max() <= 2

    # 3000-UMI group (the reference's single-link switchover point) in
    # seconds, not minutes (old implementation was O(K^3))
    K = 3000
    a = rng.integers(0, 13, (K, K)).astype(np.float64)
    d = np.triu(a, 1) + np.triu(a, 1).T
    t0 = time.time()
    complete_link_clusters(d, 2)
    assert time.time() - t0 < 30

"""5' chemistry end-to-end: scanfastq -> assignumis UMI recovery."""
import gzip

import numpy as np

from sicelore_tpu.io import fastq
from sicelore_tpu.io.bam import BamHeader, BamRecord, BamWriter
from sicelore_tpu.pipeline import readname
from sicelore_tpu.pipeline.assignumis import AssignUmisPipeline
from sicelore_tpu.pipeline.scanfastq import ScanFastqPipeline
from sicelore_tpu.utils import dna, synth
from sicelore_tpu.utils.config import PipelineConfig


def test_5p_scan_and_umi(tmp_path):
    rng = np.random.default_rng(4)
    wl = synth.make_whitelist(rng, 64)
    cells = wl[:4]
    d = tmp_path / "run"
    d.mkdir()
    truth = {}
    with gzip.open(d / "r.fastq.gz", "wb") as fh:
        for i in range(120):
            c = cells[int(rng.integers(0, 4))]
            umi = synth.random_seq(rng, 12)
            r = synth.make_read_5p(rng, c, umi=umi, cdna_len=250,
                                   error_rate=0.03, reverse=bool(i % 2))
            truth[f"m{i}"] = (c, umi)
            fh.write(b"@m%d\n" % i + r["seq"] + b"\n+\n" + r["qual"] + b"\n")
    cfg = PipelineConfig(chemistry="5p")
    pipe = ScanFastqPipeline(cfg, whitelist=wl, user_max_ed=2, chunk_size=64)
    stats = pipe.run([d], tmp_path / "scan")
    assert stats.bc_assigned > 100

    # 5p names: ascending bc coords + correct BC
    ok = tot = 0
    recs = []
    for f in sorted((tmp_path / "scan" / "passed").iterdir()):
        for ch in fastq.read_fastq(f):
            for nm, s, q in zip(ch.names, ch.seqs, ch.quals):
                info = readname.parse_name(nm)
                assert info.bc_start < info.bc_end  # ascending = 5p
                tot += 1
                ok += info.bc == truth[info.orig_name][0]
                recs.append((nm, s, q, info))
    assert ok / tot > 0.98, (ok, tot)

    # fake alignment -> assignumis recovers the UMI (sense orientation)
    header = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])
    bam = tmp_path / "s.bam"
    with BamWriter(bam, header) as w:
        for i, (nm, s, q, info) in enumerate(recs):
            w.write(BamRecord(qname=nm.decode(), flag=0, ref_id=0,
                              pos=1000 + i % 7, mapq=60,
                              cigar=[("M", len(s))], seq=s.decode(),
                              qual=bytes(x - 33 for x in q)))
    out = tmp_path / "umi.bam"
    up = AssignUmisPipeline(cfg)
    st = up.run(bam, out)
    assert st.umi_assigned > 100
    from sicelore_tpu.io.bam import BamReader
    good = tot = 0
    with BamReader(out) as rd:
        for r in rd:
            info = readname.parse_name(r.qname)
            if info is None or r.get_tag("U7") is None:
                continue
            tot += 1
            # U7 = raw UMI window; in 5p sense orientation it IS the UMI
            # (reads carry ~3% noise, so compare at ED <= 2)
            from sicelore_tpu.core.umicluster import myers_ed
            good += myers_ed(r.get_tag("U7").encode(),
                             truth[info.orig_name][1].encode()) <= 2
    assert tot > 80 and good / tot > 0.9, (good, tot)

"""GTF model loading + demon-mode incremental scan."""
import gzip
import threading
import time

import numpy as np

from sicelore_tpu.core.refflat import RefFlatModel
from sicelore_tpu.pipeline.scanfastq import ScanFastqPipeline
from sicelore_tpu.utils import synth
from sicelore_tpu.utils.config import PipelineConfig

GTF = """\
chr1\tHAVANA\tgene\t101\t600\t.\t+\t.\tgene_id "ENSG1"; gene_name "GENEA";
chr1\tHAVANA\texon\t101\t200\t.\t+\t.\tgene_id "ENSG1"; gene_name "GENEA"; transcript_id "TRA1";
chr1\tHAVANA\texon\t301\t400\t.\t+\t.\tgene_id "ENSG1"; gene_name "GENEA"; transcript_id "TRA1";
chr1\tHAVANA\texon\t501\t600\t.\t+\t.\tgene_id "ENSG1"; gene_name "GENEA"; transcript_id "TRA1";
chr1\tHAVANA\texon\t101\t200\t.\t+\t.\tgene_id "ENSG1"; gene_name "GENEA"; transcript_id "TRA2";
chr1\tHAVANA\texon\t501\t600\t.\t+\t.\tgene_id "ENSG1"; gene_name "GENEA"; transcript_id "TRA2";
"""


def test_gtf_matches_refflat(tmp_path):
    (tmp_path / "m.gtf").write_text(GTF)
    (tmp_path / "m.refFlat").write_text(
        "GENEA\tTRA1\tchr1\t+\t100\t600\t100\t600\t3\t100,300,500,\t"
        "200,400,600,\nGENEA\tTRA2\tchr1\t+\t100\t600\t100\t600\t2\t"
        "100,500,\t200,600,\n")
    g = RefFlatModel.load(tmp_path / "m.gtf")
    f = RefFlatModel.load(tmp_path / "m.refFlat")
    assert set(g.by_gene) == set(f.by_gene)
    for tid in ("TRA1", "TRA2"):
        tg, tf = g.select_one("GENEA", tid), f.select_one("GENEA", tid)
        assert tg.exons == tf.exons
        assert tg.junctions.tolist() == tf.junctions.tolist()


def _write_fastq(path, rng, wl, n, offset=0):
    with gzip.open(path, "wb") as fh:
        for i in range(n):
            r = synth.make_read(rng, wl[int(rng.integers(0, 4))],
                                cdna_len=200, error_rate=0.03)
            fh.write(b"@d%d\n" % (offset + i) + r["seq"] + b"\n+\n"
                     + r["qual"] + b"\n")


def test_demon_mode(tmp_path):
    rng = np.random.default_rng(0)
    wl = synth.make_whitelist(rng, 32)
    d = tmp_path / "run"
    d.mkdir()
    _write_fastq(d / "a.fastq.gz", rng, wl, 40)
    pipe = ScanFastqPipeline(PipelineConfig(), whitelist=wl, user_max_ed=1,
                             chunk_size=32)

    # drop a new file while the demon is polling
    def dropper():
        time.sleep(0.8)
        _write_fastq(d / "b.fastq.gz", rng, wl, 25, offset=100)

    t = threading.Thread(target=dropper)
    t.start()
    stats = pipe.run_demon([d], tmp_path / "out", poll_interval=0.4,
                           idle_timeout=2.5, log=lambda *a: None)
    t.join()
    assert stats.total_reads == 65
    assert (tmp_path / "out" / "passed" / "bFWD.fastq").exists()
    assert stats.bc_assigned > 55

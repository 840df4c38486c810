"""End-to-end scanfastq pipeline tests on synthetic data."""
import gzip
import json

import numpy as np
import pytest

from sicelore_tpu.pipeline import readname
from sicelore_tpu.pipeline.scanfastq import ScanFastqPipeline
from sicelore_tpu.utils import synth
from sicelore_tpu.utils.config import PipelineConfig
from sicelore_tpu.io import fastq


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """Synthetic sequencing run: 2 fastq files, 16 real cells drawn from a
    256-BC whitelist, ~6% read error, mixed strands, some chimeras/garbage."""
    rng = np.random.default_rng(11)
    d = tmp_path_factory.mktemp("run")
    wl = synth.make_whitelist(rng, 256)
    cells = wl[:16]
    truth = {}
    for fi in range(2):
        recs = []
        for i in range(300):
            name = f"f{fi}r{i}"
            cell = cells[int(rng.integers(0, 16))]
            r = synth.make_read(rng, cell, cdna_len=int(rng.integers(150, 700)),
                                error_rate=0.06, reverse=bool(rng.random() < 0.5))
            truth[name] = cell
            recs.append((name.encode(), r["seq"], r["qual"]))
        # some garbage + a chimera + a too-short read
        for i in range(20):
            s = synth.random_seq(rng, 400).encode()
            recs.append((f"f{fi}g{i}".encode(), s, b"I" * len(s)))
        ch = synth.make_chimera(rng, cells[0], cells[1], cdna_len=400)
        recs.append((f"f{fi}chim".encode(), ch["seq"], ch["qual"]))
        truth[f"f{fi}chim"] = cells[0]
        truth[f"f{fi}chimsp2"] = cells[1]
        recs.append((f"f{fi}short".encode(), b"ACGT" * 10, b"I" * 40))
        with gzip.open(d / f"reads{fi}.fastq.gz", "wb") as fh:
            for n, s, q in recs:
                fh.write(b"@" + n + b"\n" + s + b"\n+\n" + q + b"\n")
    return d, wl, cells, truth


def test_scanfastq_end_to_end(run_dir, tmp_path):
    d, wl, cells, truth = run_dir
    pipe = ScanFastqPipeline(PipelineConfig(), whitelist=wl, user_max_ed=2,
                             chunk_size=200)
    stats = pipe.run([d], tmp_path / "out")
    assert stats.total_reads == 644
    assert stats.too_short >= 2
    # the 16 real cells must dominate the used list
    assert set(cells) <= set(pipe.used_strs)
    assert stats.bc_assigned > 500
    assert stats.split_chimeric >= 1

    # passed reads: names parse, barcodes correct
    n_ok = n_tot = 0
    for f in sorted((tmp_path / "out" / "passed").iterdir()):
        for chunk in fastq.read_fastq(f):
            for nm, seq in zip(chunk.names, chunk.seqs):
                info = readname.parse_name(nm)
                assert info is not None, nm
                if info.orig_name in truth:
                    n_tot += 1
                    n_ok += info.bc == truth[info.orig_name]
                # stranded read must end with rc(adapter) region after polyA:
                # check PS/PE/AE ordering contract
                assert 0 <= info.ps <= info.pe < info.ae < len(seq)
                assert info.bc_start == info.ae - 1
                assert info.ed <= 2
    assert n_tot > 500
    assert n_ok / n_tot > 0.99, (n_ok, n_tot)

    # outputs exist
    out = tmp_path / "out"
    assert (out / "BarcodeList.tsv").exists()
    assert (out / "BarcodesAssigned.tsv").exists()
    stats_json = json.loads((out / "scanner_stats.json").read_text())
    assert stats_json["bc_assigned"] == stats.bc_assigned

    # BarcodesAssigned: 16 cells with big counts
    lines = (out / "BarcodesAssigned.tsv").read_text().strip().split("\n")[1:]
    big = [l.split("\t")[0] for l in lines if int(l.split("\t")[1]) > 10]
    assert set(big) == set(cells)


def test_random_barcode_negative_control(run_dir, tmp_path):
    """Reference -e/--randomBarcode: false-assignment rate must be tiny."""
    d, wl, cells, truth = run_dir
    pipe = ScanFastqPipeline(PipelineConfig(), whitelist=wl, user_max_ed=1,
                             chunk_size=200, random_barcode=True)
    stats = pipe.run([d], tmp_path / "neg")
    rate = stats.bc_assigned / max(stats.stranded, 1)
    assert rate < 0.05, rate


def test_known_cells_skips_pass1(run_dir, tmp_path):
    d, wl, cells, truth = run_dir
    pipe = ScanFastqPipeline(PipelineConfig(), whitelist=cells, user_max_ed=1,
                             chunk_size=200, known_cells=True)
    stats = pipe.run([d], tmp_path / "kc")
    assert set(pipe.used_strs) == set(cells)  # packed storage sorts the list
    assert stats.bc_assigned > 400
    assert not (tmp_path / "kc" / "BarcodeList.tsv").exists()


def test_native_emit_matches_python(tmp_path):
    """The C batch emitter must write byte-identical records to the
    Python fallback loop (readname.encode_name contract)."""
    import numpy as np

    from sicelore_tpu.io import native
    from sicelore_tpu.pipeline.scanfastq import ScanFastqPipeline
    from sicelore_tpu.io import fastq as fq
    from sicelore_tpu.utils import synth

    if native.get_hostenc() is None or \
            not hasattr(native.get_hostenc(), "emit_records"):
        import pytest
        pytest.skip("native emitter unavailable")
    rng = np.random.default_rng(11)
    wl = synth.make_whitelist(rng, 64)
    reads = [synth.make_read(rng, wl[int(rng.integers(0, 64))],
                             cdna_len=int(rng.integers(200, 500)),
                             error_rate=0.06, reverse=bool(i % 2))
             for i in range(300)]
    seqs = [r["seq"] for r in reads]
    quals = [r["qual"] for r in reads]
    chunk = fq.FastqChunk([b"r%d" % i for i in range(300)],
                          [b"c%d" % (i % 3) if i % 2 else b""
                           for i in range(300)], seqs, quals)
    pipe = ScanFastqPipeline(whitelist=wl, chunk_size=512)
    pipe.use_fixed_list()
    out = pipe.model.scan_reads(chunk.seqs, chunk.quals)
    from sicelore_tpu.ops import bcsearch
    bc = bcsearch.bc_search(out["bc_windows"].astype(np.int32),
                            pipe.used_peq, len(pipe.used_strs), 16)

    class Cap:
        def __init__(self):
            self.buf = b""

        def write(self, name, seq, qual, comment=b""):
            header = b"@" + name + ((b" " + comment) if comment else b"")
            self.buf += header + b"\n" + seq + b"\n+\n" + qual + b"\n"

        def write_raw(self, rec):
            self.buf += rec

    skip = {5, 17}
    p1, f1 = Cap(), Cap()
    pipe.pass2_emit(chunk, out, bc, p1, f1, skip=skip)
    # force the Python fallback
    pipe2 = ScanFastqPipeline(whitelist=wl, chunk_size=512)
    pipe2.use_fixed_list()
    pipe2._emit_records = lambda *a, **k: False
    p2, f2 = Cap(), Cap()
    pipe2.pass2_emit(chunk, out, bc, p2, f2, skip=skip)
    assert p1.buf == p2.buf
    assert f1.buf == f2.buf
    assert p1.buf.count(b"\n") % 4 == 0 and len(p1.buf) > 0


def test_cached_pipeline_matches_streaming(run_dir, tmp_path):
    """The pass-1 cache (FULL pass-1 + sweep-only pass-2) must be
    output-identical to the classic streaming two-pass path."""
    d, wl, cells, truth = run_dir
    results = {}
    for cached in (True, False):
        out = tmp_path / f"out_c{int(cached)}"
        pipe = ScanFastqPipeline(PipelineConfig(), whitelist=wl,
                                 user_max_ed=2, chunk_size=200,
                                 cache_pass1=cached)
        stats = pipe.run([d], out)
        blobs = {}
        for sub in ("passed", "failed"):
            for f in sorted((out / sub).iterdir()):
                blobs[f"{sub}/{f.name}"] = f.read_bytes()
        blobs["assigned"] = (out / "BarcodesAssigned.tsv").read_bytes()
        blobs["stats"] = json.dumps(stats.to_json(), sort_keys=True)
        results[cached] = blobs
    assert set(results[True]) == set(results[False])
    for k in results[True]:
        assert results[True][k] == results[False][k], f"{k} differs"

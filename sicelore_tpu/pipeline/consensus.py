"""ComputeConsensus — Step 4b.2: per-molecule consensus fastq.

Reimplements programs/ComputeConsensus.java:67-107 + MoleculeDataset
.callConsensus (utils/MoleculeDataset.java:659-743): parse the tagged BAM
(load_sequence=True, gene NOT mandatory, umi mandatory), group into
molecules, and emit one consensus fastq record per molecule named
`BC-U8-RN` (Molecule.getLabel). Per molecule the top-MAXREADS cDNAs by
minimap2 `de` feed the consensus engine (ops.poa host engine /
ops.poa_tpu batched device engine) — no spoa subprocess, no tempfiles.
"""
from __future__ import annotations

import json
from pathlib import Path

from sicelore_tpu.core.longread import LongreadParser, TagConfig
from sicelore_tpu.core.molecule import MoleculeDataset
from sicelore_tpu.ops import poa


def compute_consensus(input_bam, output_fastq, maxreads: int = 20,
                      minps: int = 3, maxps: int = 20,
                      tags: TagConfig | None = None, engine=None,
                      log_json=None):
    """engine: callable(list_of_molecule_seq_lists) -> list[(cons, qv)];
    defaults to the host poa engine molecule-by-molecule."""
    parser = LongreadParser(input_bam, keep_mapqv0=False, load_sequence=True,
                            gene_mandatory=False, umi_mandatory=True,
                            tags=tags)
    dataset = MoleculeDataset(parser)
    jobs = []  # (label, [cdna seqs])
    for mol in dataset.molecules.values():
        label = f"{mol.barcode}-{mol.umi}-{len(mol.longreads)}"
        # best record per read, top-MAXREADS by ascending de
        # (Consensus ctor sorts evidence by de; Consensus.java:34-50)
        lrs = sorted(mol.longreads, key=lambda lr: lr.best_record().de)
        seqs = [lr.best_record().cdna for lr in lrs[:maxreads]
                if lr.best_record().cdna]
        jobs.append((label, seqs))
    if engine is None:
        results = [poa.consensus_reads(seqs, minps, maxps)
                   for _, seqs in jobs]
    else:
        results = engine([seqs for _, seqs in jobs], minps=minps,
                         maxps=maxps)
    out = Path(output_fastq)
    out.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(out, "wb") as fh:
        for (label, _), (cons, qv) in zip(jobs, results):
            if not cons:
                continue
            fh.write(b"@" + label.encode() + b"\n" + cons + b"\n+\n"
                     + qv + b"\n")
            n += 1
    stats = {"molecules": len(jobs), "written": n,
             "total_records": parser.stats.total_records,
             "valid_records": parser.stats.valid_records}
    if log_json:
        with open(log_json, "w") as fh:
            json.dump(stats, fh, indent=1)
    return stats

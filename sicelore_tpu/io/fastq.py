"""Fastq I/O: multi-file discovery, chunked batch reading, gz support.

Host-side equivalent of the jar's parallel fastq machinery
(readerwriter/FastqFileReader $ReadChunk/$Worker, FoundFiles, FastqWriterThreadPool;
reference README.md:155-162 "don't merge fastqs — multiple fastqs process much
faster"). Reads stream in fixed-size chunks that feed fixed-shape device
batches; writers append per output class (passed/failed), preserving the
reference's directory layout.
"""
from __future__ import annotations

import gzip
import io
import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np


@dataclass
class FastqChunk:
    """A chunk of reads as parallel lists (converted to tensors downstream)."""
    names: list[bytes]      # read name (without '@', without comment)
    comments: list[bytes]   # rest of header line (b"" if none)
    seqs: list[bytes]
    quals: list[bytes]

    def __len__(self) -> int:
        return len(self.names)


def find_fastq_files(directory: str | Path, pattern: str = r".*\.(fastq|fq)(\.gz)?$",
                     recursive: bool = True) -> list[Path]:
    """Recursive regex discovery of fastq files (jar FoundFiles equivalent)."""
    rx = re.compile(pattern)
    root = Path(directory)
    it = root.rglob("*") if recursive else root.glob("*")
    return sorted(p for p in it if p.is_file() and rx.match(p.name))


def _open(path: str | Path, mode: str = "rb"):
    p = str(path)
    if p.endswith(".gz"):
        return gzip.open(p, mode)
    return open(p, mode, buffering=1 << 20)


def read_fastq(path: str | Path, chunk_size: int = 50_000) -> Iterator[FastqChunk]:
    """Stream one fastq file in chunks of `chunk_size` reads."""
    names, comments, seqs, quals = [], [], [], []
    with _open(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().rstrip(b"\r\n")
            plus = fh.readline()
            qual = fh.readline().rstrip(b"\r\n")
            if not qual and not seq:
                break
            header = header.rstrip(b"\r\n")
            if not header.startswith(b"@"):
                raise ValueError(f"malformed fastq header in {path}: {header[:60]!r}")
            sp = header.find(b" ")
            if sp == -1:
                name, comment = header[1:], b""
            else:
                name, comment = header[1:sp], header[sp + 1:]
            names.append(name)
            comments.append(comment)
            seqs.append(seq)
            quals.append(qual)
            if len(names) >= chunk_size:
                yield FastqChunk(names, comments, seqs, quals)
                names, comments, seqs, quals = [], [], [], []
    if names:
        yield FastqChunk(names, comments, seqs, quals)


def read_fastq_dirs(paths: list[str | Path], chunk_size: int = 50_000,
                    pattern: str = r".*\.(fastq|fq)(\.gz)?$") -> Iterator[FastqChunk]:
    """Stream reads from files and/or directories (recursively discovered)."""
    files: list[Path] = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            files.extend(find_fastq_files(p, pattern))
        else:
            files.append(p)
    for f in files:
        yield from read_fastq(f, chunk_size)


class FastqWriter:
    """Buffered fastq writer (optionally gzip)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = _open(self.path, "wb")
        self._buf: list[bytes] = []

    def write(self, name: bytes, seq: bytes, qual: bytes, comment: bytes = b""):
        header = b"@" + name + ((b" " + comment) if comment else b"")
        self._buf.append(header + b"\n" + seq + b"\n+\n" + qual + b"\n")
        if len(self._buf) >= 4096:
            self.flush()

    def flush(self):
        if self._buf:
            self._fh.write(b"".join(self._buf))
            self._buf.clear()

    def close(self):
        self.flush()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_fastq_dict(directory: str | Path) -> dict[bytes, tuple[bytes, bytes]]:
    """Whole-directory fastq -> {name: (seq, qual)} (reference FastqLoader,
    utils/FastqLoader.java — RAM-bound by design)."""
    out: dict[bytes, tuple[bytes, bytes]] = {}
    d = Path(directory)
    files = find_fastq_files(d) if d.is_dir() else [d]
    for f in files:
        for chunk in read_fastq(f, chunk_size=200_000):
            for n, s, q in zip(chunk.names, chunk.seqs, chunk.quals):
                out[n] = (s, q)
    return out

"""FASTA read/write with transparent decompression.

Reference: io/fasta.rs (multi-file reader with per-file decompression and a
global record index, io/fasta.rs:50-128; 80-column writer, io/fasta.rs:223-251).
"""
from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

# header split: name = leading non-whitespace run (possibly empty), desc =
# the rest (fasta.rs semantics — '> desc' yields an empty name with a desc)
_HEADER_RE = re.compile(r"(\S*)\s*(.*)")

from pangraph_tpu.graph.seq import as_seq, to_str, validate_alphabet
from pangraph_tpu.io.files import create_maybe_compressed, open_maybe_compressed


@dataclass
class FastaRecord:
    seq_name: str
    desc: str  # or None
    seq: np.ndarray  # uint8 ASCII
    index: int


class FastaError(ValueError):
    """Malformed or empty FASTA input (clean one-line message for the CLI)."""


def read_fasta(paths, validate: bool = True) -> list:
    """Read one or many FASTA files into records with a global running index.

    Raises FastaError with the offending path for unreadable files, files
    with no FASTA records, and git-LFS pointer stubs (the reference fails
    with a clean contextual error here too, io/fasta.rs:265-287)."""
    if isinstance(paths, (str, bytes)) or not hasattr(paths, "__iter__"):
        paths = [paths]
    records = []
    index = 0
    for path in paths:
        n_before = index
        try:
            f = open_maybe_compressed(path, "rt")
        except OSError as e:
            raise FastaError(f"cannot read FASTA input '{path}': {e}") from e
        with f:
            name, desc, chunks = None, None, []
            first_line = True
            for line in f:
                # whole-line strip: indented headers and skewed sequence
                # indentation are accepted (fasta.rs test_fasta_reader_
                # multiline_and_skewed_indentation / dedent_nuc)
                line = line.strip()
                if first_line:
                    first_line = False
                    if line.startswith("version https://git-lfs"):
                        raise FastaError(
                            f"'{path}' is a git-LFS pointer stub, not FASTA data "
                            "(run `git lfs pull` to fetch the real file)"
                        )
                if line.startswith(">"):
                    if name is not None:
                        records.append(_finish(name, desc, chunks, index, validate, path))
                        index += 1
                    # split on the RAW header: '> desc' yields an EMPTY name
                    # with a description (fasta.rs test_fasta_reader_dedent_nuc
                    # pins "> SneezeC-19" -> name "", desc "SneezeC-19")
                    m = _HEADER_RE.match(line[1:])
                    name = m.group(1)
                    desc = m.group(2).strip() or None
                    chunks = []
                elif line and name is not None:
                    chunks.append(line)
            if name is not None:
                records.append(_finish(name, desc, chunks, index, validate, path))
                index += 1
        if index == n_before:
            raise FastaError(f"no FASTA records in '{path}'")
    if not records:
        raise FastaError("no FASTA records in input")
    return records


def _finish(name, desc, chunks, index, validate, path=None) -> FastaRecord:
    seq = as_seq("".join(chunks).upper())
    if len(seq) == 0:
        where = f" in '{path}'" if path else ""
        raise FastaError(f"FASTA record '{name}'{where} has an empty sequence")
    if validate:
        try:
            validate_alphabet(seq, name)
        except ValueError as e:
            where = f" in '{path}'" if path else ""
            raise FastaError(f"invalid sequence for record '{name}'{where}: {e}") from e
    return FastaRecord(seq_name=name, desc=desc, seq=seq, index=index)


def write_fasta(path_or_file, records, width: int = 80) -> None:
    """Write records, wrapping sequence lines at `width` columns (fasta.rs:223)."""
    f = path_or_file
    close = False
    if isinstance(path_or_file, (str, bytes)) or hasattr(path_or_file, "__fspath__") or path_or_file is None:
        f = create_maybe_compressed(path_or_file, "wt")
        close = True
    try:
        for rec in records:
            name, desc, seq = rec.seq_name, rec.desc, rec.seq
            header = f">{name} {desc}" if desc else f">{name}"
            f.write(header + "\n")
            s = to_str(as_seq(seq))
            for i in range(0, len(s), width):
                f.write(s[i : i + width] + "\n")
    finally:
        if close and f is not None and f.name != "<stdout>":
            f.close()

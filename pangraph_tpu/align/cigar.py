"""CIGAR utilities. A cigar is a list of (length, op) tuples, op in 'MID=X'.

Reference: align/bam/cigar.rs (parse, invert, ref/qry switch, flanking-indel
extension)."""
from __future__ import annotations

import re

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_MATCH_OPS = ("M", "=", "X")


def parse_cigar(s: str) -> list:
    s = s.replace(" ", "").replace("\t", "")
    out = [(int(n), op) for n, op in _CIGAR_RE.findall(s)]
    if sum(len(str(n)) + 1 for n, op in out) != len(s):
        raise ValueError(f"Invalid CIGAR string: {s!r}")
    return out


def cigar_str(cigar) -> str:
    return "".join(f"{n}{op}" for n, op in cigar)


def cigar_matches_len(cigar) -> int:
    return sum(n for n, op in cigar if op in _MATCH_OPS)


def cigar_total_len(cigar) -> int:
    return sum(n for n, _ in cigar)


def cigar_ref_len(cigar) -> int:
    return sum(n for n, op in cigar if op in _MATCH_OPS or op == "D")


def cigar_qry_len(cigar) -> int:
    return sum(n for n, op in cigar if op in _MATCH_OPS or op == "I")


def cigar_no_indels(cigar) -> bool:
    return all(op in _MATCH_OPS for _, op in cigar)


def invert_cigar(cigar) -> list:
    """Reverse op order (cigar.rs:26-29)."""
    return list(reversed(cigar))


def cigar_switch_ref_qry(cigar) -> list:
    """Swap I <-> D (cigar.rs:31-44)."""
    out = []
    for n, op in cigar:
        if op in _MATCH_OPS:
            out.append((n, op))
        elif op == "I":
            out.append((n, "D"))
        elif op == "D":
            out.append((n, "I"))
        else:
            raise ValueError(f"Unsupported op {op!r}")
    return out


def add_flanking_indel(cigar, kind: str, add_len: int, leading: bool) -> list:
    """Extend/insert a flanking indel before the first match from the given side
    (cigar.rs:62-98)."""
    if kind not in ("I", "D"):
        raise ValueError(f"Unsupported kind {kind!r}")
    ops = list(cigar)
    order = enumerate(ops) if leading else reversed(list(enumerate(ops)))
    replace = None
    for i, (n, op) in order:
        if op in _MATCH_OPS:
            break
        if op == kind:
            replace = (i, (n + add_len, kind))
    if replace is not None:
        ops[replace[0]] = replace[1]
    else:
        ops.insert(0 if leading else len(ops), (add_len, kind))
    return ops


def collapse_cigar(cigar) -> list:
    """Merge adjacent same-op runs and drop zero-length ops."""
    out = []
    for n, op in cigar:
        if n == 0:
            continue
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + n, op)
        else:
            out.append((n, op))
    return out


def edit_to_cigar(edit, ref_len: int) -> list:
    """Ref-major CIGAR from an Edit (inverse of edits.edit_from_cigar).
    Insertions sort before deletions at equal positions."""
    events = [(i.pos, 0, len(i.seq)) for i in edit.inss] + [(d.pos, 1, d.len) for d in edit.dels]
    events.sort()
    ops = []
    rpos = 0
    for pos, kind, length in events:
        if pos > rpos:
            ops.append((pos - rpos, "M"))
            rpos = pos
        if kind == 0:
            ops.append((length, "I"))
        else:
            ops.append((length, "D"))
            rpos += length
    if rpos < ref_len:
        ops.append((ref_len - rpos, "M"))
    return collapse_cigar(ops)


def cigar_from_aligned_pair(ref_aln, qry_aln) -> list:
    """CIGAR (ref-major) from a gapped aligned pair of uint8 arrays."""
    import numpy as np
    from pangraph_tpu.graph.seq import GAP

    rgap = ref_aln == GAP
    qgap = qry_aln == GAP
    # op code per column: 0=M, 1=I (ref gap), 2=D (qry gap)
    code = np.where(rgap, 1, np.where(qgap, 2, 0))
    if len(code) == 0:
        return []
    change = np.flatnonzero(np.diff(code)) + 1
    bounds = np.concatenate(([0], change, [len(code)]))
    ops = "MID"
    return [(int(e - s), ops[int(code[s])]) for s, e in zip(bounds[:-1], bounds[1:])]

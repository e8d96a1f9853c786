"""Per-genome edit sets relative to a block consensus.

Reference semantics: `packages/pangraph/src/pangraph/edits.rs` (Sub/Del/Ins/Edit
with apply / apply_aligned / concat / shift / reverse_complement / from_cigar /
band statistics). Conventions preserved exactly:

- `Ins.pos` is the consensus index *before which* the insertion sits; the
  convention is "position after the insertion" at the producer side
  (`align/map_variations.rs:70-73`), so pos ranges over 0..=len(consensus).
- `apply` strips deletions and splices insertions (edits.rs:307-331);
  multiple insertions at one position land in ascending (pos, seq) order.
- `apply_aligned` keeps deletions as '-' and drops insertions (edits.rs:333).

The containers are plain Python dataclasses with numpy payloads for insertion
sequences; hot batched application happens in vectorized form.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pangraph_tpu.graph.seq import GAP, as_seq, complement, revcomp


@dataclass(frozen=True, slots=True)
class Sub:
    pos: int
    alt: str  # single character

    def reverse_complement(self, length: int) -> "Sub":
        # edits.rs:29-34
        return Sub(length - self.pos - 1, chr(int(complement(as_seq(self.alt))[0])))

    def shift(self, delta: int) -> "Sub":
        return Sub(self.pos + delta, self.alt)


@dataclass(frozen=True, slots=True)
class Del:
    pos: int
    len: int

    @property
    def end(self) -> int:
        return self.pos + self.len

    def contains(self, pos: int) -> bool:
        return self.pos <= pos < self.end

    def reverse_complement(self, length: int) -> "Del":
        # edits.rs:68-73
        return Del(length - self.pos - self.len, self.len)

    def shift(self, delta: int) -> "Del":
        return Del(self.pos + delta, self.len)


@dataclass(frozen=True, slots=True)
class Ins:
    pos: int
    seq: str

    def reverse_complement(self, length: int) -> "Ins":
        # edits.rs:98-103
        return Ins(length - self.pos, revcomp(as_seq(self.seq)).tobytes().decode())

    def shift(self, delta: int) -> "Ins":
        return Ins(max(self.pos + delta, 0), self.seq)


@dataclass(slots=True)
class Edit:
    """An edit set: substitutions, deletions, insertions (edits.rs:116)."""

    subs: list = field(default_factory=list)
    dels: list = field(default_factory=list)
    inss: list = field(default_factory=list)

    # ---------------------------------------------------------------- basics
    @staticmethod
    def empty() -> "Edit":
        return Edit()

    @staticmethod
    def deleted(length: int) -> "Edit":
        # edits.rs:244-250
        return Edit(dels=[Del(0, length)])

    def is_empty(self) -> bool:
        return not (self.subs or self.dels or self.inss)

    def has_indels(self) -> bool:
        return bool(self.dels or self.inss)

    def has_subs(self) -> bool:
        return bool(self.subs)

    def copy(self) -> "Edit":
        return Edit(list(self.subs), list(self.dels), list(self.inss))

    def __eq__(self, other) -> bool:
        return (
            sorted(self.subs, key=lambda s: (s.pos, s.alt)) == sorted(other.subs, key=lambda s: (s.pos, s.alt))
            and sorted(self.dels, key=lambda d: (d.pos, d.len)) == sorted(other.dels, key=lambda d: (d.pos, d.len))
            and sorted(self.inss, key=lambda i: (i.pos, i.seq)) == sorted(other.inss, key=lambda i: (i.pos, i.seq))
        )

    # ------------------------------------------------------------- transforms
    def reverse_complement(self, length: int) -> "Edit":
        # edits.rs:257-283; results re-sorted by position
        return Edit(
            subs=sorted((s.reverse_complement(length) for s in self.subs), key=lambda s: s.pos),
            dels=sorted((d.reverse_complement(length) for d in self.dels), key=lambda d: d.pos),
            inss=sorted((i.reverse_complement(length) for i in self.inss), key=lambda i: i.pos),
        )

    def shift(self, delta: int) -> "Edit":
        return Edit(
            subs=[s.shift(delta) for s in self.subs],
            dels=[d.shift(delta) for d in self.dels],
            inss=[i.shift(delta) for i in self.inss],
        )

    def concat(self, nxt: "Edit") -> "Edit":
        """Concatenate edit sets of two consecutive consensus segments
        (edits.rs:286-305). Insertions at an identical position merge
        self-first."""
        inss = [Ins(i.pos, i.seq) for i in self.inss]
        by_pos = {i.pos: k for k, i in enumerate(inss)}
        for ins in nxt.inss:
            if ins.pos in by_pos:
                k = by_pos[ins.pos]
                inss[k] = Ins(ins.pos, inss[k].seq + ins.seq)
            else:
                by_pos[ins.pos] = len(inss)
                inss.append(ins)
        return Edit(subs=self.subs + nxt.subs, dels=self.dels + nxt.dels, inss=inss)

    # ------------------------------------------------------------- application
    def apply(self, ref: np.ndarray) -> np.ndarray:
        """Apply edits to the consensus to recover the genome sequence
        (edits.rs:307-331)."""
        ref = as_seq(ref)
        qry = ref.copy()
        if self.subs:
            pos = np.fromiter((s.pos for s in self.subs), dtype=np.int64, count=len(self.subs))
            alt = np.fromiter((ord(s.alt) for s in self.subs), dtype=np.uint8, count=len(self.subs))
            qry[pos] = alt
        keep = None
        if self.dels:
            keep = np.ones(len(qry), dtype=bool)
            for d in self.dels:
                keep[d.pos : d.pos + d.len] = False
        if not self.inss:
            return qry[keep] if keep is not None else qry
        parts = []
        prev = 0
        for ins in sorted(self.inss, key=lambda i: (i.pos, i.seq)):
            seg = qry[prev : ins.pos]
            if keep is not None:
                seg = seg[keep[prev : ins.pos]]
            parts.append(seg)
            parts.append(as_seq(ins.seq))
            prev = ins.pos
        seg = qry[prev:]
        if keep is not None:
            seg = seg[keep[prev:]]
        parts.append(seg)
        return np.concatenate(parts)

    def apply_aligned(self, ref: np.ndarray) -> np.ndarray:
        """Subs + deletions-as-gaps, no insertions (edits.rs:333-347)."""
        qry = as_seq(ref).copy()
        if self.subs:
            pos = np.fromiter((s.pos for s in self.subs), dtype=np.int64, count=len(self.subs))
            alt = np.fromiter((ord(s.alt) for s in self.subs), dtype=np.uint8, count=len(self.subs))
            qry[pos] = alt
        for d in self.dels:
            qry[d.pos : d.pos + d.len] = GAP
        return qry

    # ----------------------------------------------------------------- queries
    def is_empty_alignment(self, consensus: np.ndarray) -> bool:
        # edits.rs:349-367
        if sum(len(i.seq) for i in self.inss) > 0:
            return False
        if sum(d.len for d in self.dels) < len(consensus):
            return False
        return len(self.apply(consensus)) == 0

    def aligned_count(self, cons_len: int) -> int:
        # edits.rs:438-441: non-deleted consensus positions
        return max(cons_len - sum(d.len for d in self.dels), 0)

    def aligned_count_after(self, p: int, cons_len: int) -> int:
        # edits.rs:418-436
        total = max(cons_len - p, 0)
        overlap = 0
        for d in self.dels:
            if d.end > p:
                overlap += d.end - max(p, d.pos)
        return max(total - overlap, 0)

    def unaligned_length(self, cons_len: int) -> int:
        # pangraph_block.rs:91-95
        return cons_len + sum(len(i.seq) for i in self.inss) - sum(d.len for d in self.dels)

    # --------------------------------------------- edge-indel decomposition
    # (edits.rs:372-415 — reweave's block-extension bookkeeping classifies
    # indel mass into leading / trailing / internal)
    def leading_deletions(self) -> int:
        return sum(d.len for d in self.dels if d.pos == 0)

    def trailing_deletions(self, cons_len: int) -> int:
        return sum(d.len for d in self.dels if d.end == cons_len)

    def internal_deletions(self, cons_len: int) -> int:
        total = sum(d.len for d in self.dels)
        # a full-span deletion counts as BOTH leading and trailing; clamp at
        # zero instead of going negative (the reference's usize arithmetic
        # would underflow-panic on that degenerate input, edits.rs:387-392 —
        # such nodes are removed upstream as empty, but the API should not
        # return nonsense)
        return max(total - self.leading_deletions() - self.trailing_deletions(cons_len), 0)

    def leading_insertions(self) -> int:
        return sum(len(i.seq) for i in self.inss if i.pos == 0)

    def trailing_insertions(self, cons_len: int) -> int:
        return sum(len(i.seq) for i in self.inss if i.pos == cons_len)

    def internal_insertions(self, cons_len: int) -> int:
        total = sum(len(i.seq) for i in self.inss)
        # clamp as in internal_deletions (an insertion at pos 0 of an empty
        # consensus is both leading and trailing)
        return max(total - self.leading_insertions() - self.trailing_insertions(cons_len), 0)

    def has_dels(self) -> bool:
        return bool(self.dels)

    def has_inss(self) -> bool:
        return bool(self.inss)

    # ------------------------------------------------------------ band stats
    def _aligned_count_after_vec(self, ps: np.ndarray, cons_len: int) -> np.ndarray:
        """aligned_count_after for a vector of positions, O((E+P) log E).
        Deletions are sorted and non-overlapping (Edit invariant), so the
        overlap beyond p is a suffix sum plus one partial run."""
        ps = np.asarray(ps, dtype=np.int64)
        total = np.maximum(cons_len - ps, 0)
        if not self.dels:
            return total
        d_pos = np.array([d.pos for d in self.dels], dtype=np.int64)
        d_len = np.array([d.len for d in self.dels], dtype=np.int64)
        d_end = d_pos + d_len
        suffix = np.concatenate([np.cumsum(d_len[::-1])[::-1], [0]])
        j = np.searchsorted(d_pos, ps, side="left")  # first del with pos >= p
        overlap = suffix[j]
        # partial overlap of the deletion straddling p (the one before index j)
        has_prev = j > 0
        jp = np.maximum(j - 1, 0)
        part = np.where(has_prev, np.maximum(d_end[jp] - ps, 0), 0)
        return np.maximum(total - overlap - part, 0)

    def aln_mean_shift(self, cons_len: int):
        """Mean displacement of query vs consensus positions (edits.rs:443-484).
        Returns None if no consensus position is aligned."""
        aligned = self.aligned_count_after(0, cons_len)
        if aligned == 0:
            return None
        total = 0
        if self.inss:
            i_pos = np.array([i.pos for i in self.inss], dtype=np.int64)
            i_len = np.array([len(i.seq) for i in self.inss], dtype=np.int64)
            total -= int(np.sum(i_len * self._aligned_count_after_vec(i_pos, cons_len)))
        if self.dels:
            d_pos = np.array([d.pos for d in self.dels], dtype=np.int64)
            d_len = np.array([d.len for d in self.dels], dtype=np.int64)
            total += int(np.sum(d_len * self._aligned_count_after_vec(d_pos, cons_len)))
        # round-half-away-from-zero, matching Rust f64::round
        x = total / aligned
        return int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))

    def aln_bandwidth(self, cons_len: int, mean_shift: int):
        """Max |displacement - mean_shift| over the alignment (edits.rs:486-536)."""
        if self.aligned_count_after(0, cons_len) == 0:
            return None
        n = len(self.inss) + len(self.dels)
        if n == 0:
            return 0
        pos = np.empty(n, dtype=np.int64)
        delta = np.empty(n, dtype=np.int64)
        k = 0
        for i in self.inss:
            pos[k], delta[k] = i.pos, -len(i.seq)
            k += 1
        for d in self.dels:
            pos[k], delta[k] = d.pos, d.len
            k += 1
        order = np.argsort(pos, kind="stable")
        pos, delta = pos[order], delta[order]
        band = np.cumsum(delta)
        dev = np.abs(band - mean_shift)
        max_bw = 0
        if pos[0] > 0:
            max_bw = abs(mean_shift)
        # trailing in/del does not widen the band (edits.rs:523-526)
        last_trailing = pos[-1] == cons_len or (delta[-1] > 0 and pos[-1] + delta[-1] == cons_len)
        head_max = int(dev[:-1].max()) if n > 1 else 0
        max_bw = max(max_bw, head_max)
        if not last_trailing:
            max_bw = max(max_bw, int(dev[-1]))
        return max_bw

    # ------------------------------------------------------- consensus updates
    def is_position_deleted(self, pos: int) -> bool:
        return any(d.contains(pos) for d in self.dels)

    def reconcile_substitution_with_consensus(self, sub: Sub, original: str) -> None:
        """Adjust this edit when the consensus char at sub.pos changes to sub.alt
        (edits.rs:186-243). `original` is the pre-change consensus char."""
        self.reconcile_substitutions_with_consensus([sub], [original])

    def reconcile_substitutions_with_consensus(self, subs: list, originals: list) -> None:
        """Batch form of the consensus-flip reconciliation: one pass over this
        edit's subs/dels for any number of consensus changes (positions are
        distinct — majority votes are per-position). Semantics per position
        match edits.rs:186-243 exactly."""
        if not subs:
            return
        by_pos = {}
        for s in self.subs:
            if s.pos in by_pos:
                raise ValueError(f"Position {s.pos}: conflicting substitutions")
            by_pos[s.pos] = s
        if self.dels:
            d_pos = np.array([d.pos for d in self.dels], dtype=np.int64)
            d_end = d_pos + np.array([d.len for d in self.dels], dtype=np.int64)
            order = np.argsort(d_pos, kind="stable")
            d_pos, d_end = d_pos[order], d_end[order]
            ps = np.array([s.pos for s in subs], dtype=np.int64)
            j = np.searchsorted(d_pos, ps, side="right") - 1
            deleted = (j >= 0) & (ps < d_end[np.maximum(j, 0)])
        else:
            deleted = np.zeros(len(subs), dtype=bool)
        changed = False
        for k, (sub, original) in enumerate(zip(subs, originals)):
            cur = by_pos.get(sub.pos)
            if cur is None:
                if not deleted[k]:
                    by_pos[sub.pos] = Sub(sub.pos, original)
                    changed = True
            else:
                if deleted[k]:
                    raise ValueError(f"Position {sub.pos}: both substitution and deletion present")
                if cur.alt == sub.alt:
                    del by_pos[sub.pos]
                    changed = True
        if changed:
            self.subs = [by_pos[p] for p in sorted(by_pos)]

    # ----------------------------------------------------------------- checks
    def sanity_check(self, length: int) -> None:
        # edits.rs:569+: bounds, no double subs, no sub-in-del, no zero/overlapping
        # dels, ins bounds 0..=length
        if self.subs:
            ps = np.array([s.pos for s in self.subs], dtype=np.int64)
            if (ps < 0).any() or (ps >= length).any():
                raise ValueError(f"Sub position out of bounds (len {length})")
            if any(s.alt == "-" for s in self.subs):
                raise ValueError("Substitution with '-' is not allowed")
            uniq = np.unique(ps)
            if len(uniq) != len(ps):
                raise ValueError("Two substitutions at the same position")
            if self.dels:
                d_pos = np.array([d.pos for d in self.dels], dtype=np.int64)
                d_end = d_pos + np.array([d.len for d in self.dels], dtype=np.int64)
                order = np.argsort(d_pos, kind="stable")
                d_pos, d_end = d_pos[order], d_end[order]
                j = np.searchsorted(d_pos, ps, side="right") - 1
                if ((j >= 0) & (ps < d_end[np.maximum(j, 0)])).any():
                    raise ValueError("Substitution at deleted position")
        dels = sorted(self.dels, key=lambda d: d.pos)
        for k, d in enumerate(dels):
            if d.len == 0:
                raise ValueError(f"Deletion {d} has length 0")
            if not (0 <= d.pos < length) or d.end > length:
                raise ValueError(f"Deletion {d} out of bounds (len {length})")
            if k and dels[k - 1].end > d.pos:
                raise ValueError(f"Overlapping deletions {dels[k-1]} and {d}")
        for i in self.inss:
            if not (0 <= i.pos <= length):
                raise ValueError(f"Insertion {i} out of bounds (len {length})")
            if len(i.seq) == 0:
                raise ValueError(f"Insertion {i} is empty")

    # -------------------------------------------------------------------- json
    def to_json(self) -> dict:
        return {
            "subs": [{"pos": s.pos, "alt": s.alt} for s in self.subs],
            "dels": [{"pos": d.pos, "len": d.len} for d in self.dels],
            "inss": [{"pos": i.pos, "seq": i.seq} for i in self.inss],
        }

    @staticmethod
    def from_json(d: dict) -> "Edit":
        return Edit(
            subs=[Sub(s["pos"], s["alt"]) for s in d.get("subs", [])],
            dels=[Del(x["pos"], x["len"]) for x in d.get("dels", [])],
            inss=[Ins(i["pos"], i["seq"]) for i in d.get("inss", [])],
        )


def edit_from_cigar(cigar) -> Edit:
    """Edit set from a CIGAR (edits.rs:538-567): M advances ref; I -> Ins of 'N's
    at current ref pos; D -> Del. `cigar` is a list of (length, op) with op in
    'MID=X'."""
    rpos = 0
    inss, dels = [], []
    for length, op in cigar:
        if op in ("M", "=", "X"):
            rpos += length
        elif op == "I":
            inss.append(Ins(rpos, "N" * length))
        elif op == "D":
            dels.append(Del(rpos, length))
            rpos += length
        else:
            raise ValueError(f"Unsupported CIGAR op {op!r}")
    return Edit(subs=[], dels=dels, inss=inss)

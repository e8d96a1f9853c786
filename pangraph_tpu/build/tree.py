"""Guide tree: neighbor joining over mash distances, Newick IO, postorder merge
schedule.

Reference: tree/neighbor_joining.rs (Q-matrix NJ), tree/clade.rs (postorder),
tree/newick.rs (parser/serializer + user-supplied guide tree validation),
tree/balance.rs (tree balancing — disabled upstream, enabled here for
multi-host parallel scheduling).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pangraph_tpu.align.minimizer import mash_distance


@dataclass
class Clade:
    data: object = None
    left: "Clade" = None
    right: "Clade" = None
    name: str = None
    # length of the edge ABOVE this clade (toward its parent), or None.
    # The reference's parser accepts-and-ignores lengths and its serializer
    # emits none (tree/newick.rs:41, 14-38); we keep them end to end: NJ
    # computes standard join distances and to_newick round-trips them.
    branch_length: float = None

    def is_leaf(self) -> bool:
        return self.left is None and self.right is None

    def postorder(self):
        if self.left is not None:
            yield from self.left.postorder()
        if self.right is not None:
            yield from self.right.postorder()
        yield self

    def depth(self) -> int:
        if self.is_leaf():
            return 1
        return 1 + max(self.left.depth(), self.right.depth())

    def n_leaves(self) -> int:
        if self.is_leaf():
            return 1
        return self.left.n_leaves() + self.right.n_leaves()

    def to_newick(self) -> str:
        def blen(c):
            return "" if c.branch_length is None else f":{c.branch_length:g}"

        def rec(c):
            if c.is_leaf():
                return (c.name or "") + blen(c)
            return f"({rec(c.left)},{rec(c.right)})" + (c.name or "") + blen(c)

        return rec(self) + ";"


def create_q_matrix(d: np.ndarray) -> np.ndarray:
    # neighbor_joining.rs:46-61
    n = d.shape[0]
    q = (n - 2.0) * d - d.sum(axis=0)[None, :] - d.sum(axis=1)[:, None]
    np.fill_diagonal(q, np.inf)
    return q


def _nj_join_loop(nodes: list, d: np.ndarray) -> Clade:
    """Shared NJ loop (neighbor_joining.rs:81-100 join_in_place), plus the
    standard limb-length formulas the reference omits: joining i,j among n
    nodes gives node i the branch length 0.5*d(i,j) + (Si - Sj)/(2(n-2))
    (Saitou-Nei / the Wikipedia NJ example), node j the remainder; the final
    two nodes split their distance evenly across the root."""
    d = d.astype(float).copy()
    while len(nodes) > 2:
        n = d.shape[0]
        q = create_q_matrix(d)
        flat = int(np.argmin(q))
        i, j = divmod(flat, d.shape[0])
        if i > j:
            i, j = j, i
        li = 0.5 * d[i, j] + (d[i, :].sum() - d[j, :].sum()) / (2.0 * (n - 2))
        nodes[i].branch_length = float(li)
        nodes[j].branch_length = float(d[i, j] - li)
        nodes[i] = Clade(left=nodes[i], right=nodes[j])
        nodes.pop(j)
        dn = 0.5 * (d[i, :] + d[j, :] - d[i, j])
        d[i, :] = dn
        d[:, i] = dn
        d[i, i] = 0.0
        d = np.delete(np.delete(d, j, axis=0), j, axis=1)
    if len(nodes) == 1:
        return nodes[0]
    nodes[0].branch_length = float(0.5 * d[0, 1])
    nodes[1].branch_length = float(0.5 * d[0, 1])
    return Clade(left=nodes[0], right=nodes[1])


def neighbor_joining_tree(items: list, distances: np.ndarray) -> Clade:
    """NJ over a distance matrix; items become leaf data
    (neighbor_joining.rs:16-103)."""
    nodes = [Clade(data=item, name=getattr(item, "name", None)) for item in items]
    if len(nodes) == 1:
        return nodes[0]
    return _nj_join_loop(nodes, distances)


def build_guide_tree(names: list, seqs: list) -> Clade:
    """Mash-distance NJ guide tree over input sequences."""
    leaves = [Clade(data=i, name=names[i]) for i in range(len(names))]
    if len(leaves) == 1:
        return leaves[0]
    d = mash_distance(seqs)
    return neighbor_joining_tree_from_leaves(leaves, d)


def neighbor_joining_tree_from_leaves(leaves: list, d: np.ndarray) -> Clade:
    nodes = list(leaves)
    if len(nodes) == 1:
        return nodes[0]
    return _nj_join_loop(nodes, d)


def balance_tree(tree: Clade) -> Clade:
    """Rebalance to reduce depth and expose merge parallelism
    (tree/balance.rs:6 — written but disabled upstream). Recursively rebuilds
    so sibling subtrees have near-equal leaf counts, preserving the leaf
    grouping order of the original tree."""
    leaves_in_order = [c for c in tree.postorder() if c.is_leaf()]
    if len(leaves_in_order) <= 2:
        return tree

    def build(leaves):
        if len(leaves) == 1:
            return leaves[0]
        mid = len(leaves) // 2
        return Clade(left=build(leaves[:mid]), right=build(leaves[mid:]))

    return build(leaves_in_order)


# ------------------------------------------------------------------- newick
def parse_newick(text: str) -> Clade:
    """Minimal Newick parser: names, optional branch lengths (KEPT on
    Clade.branch_length; the reference accepts-and-ignores them,
    tree/newick.rs:41), strict binary topology enforced by the caller
    (tree/newick.rs:43-140). A ':' not followed by a number is an error
    (newick.rs:253 parse_branch_length)."""
    text = text.strip()
    if not text.endswith(";"):
        raise ValueError("Newick string must end with ';'")
    pos = 0
    s = text[:-1]

    def parse_clade():
        nonlocal pos
        node = Clade()
        children = []
        if pos < len(s) and s[pos] == "(":
            pos += 1
            while True:
                children.append(parse_clade())
                if pos < len(s) and s[pos] == ",":
                    pos += 1
                    continue
                if pos < len(s) and s[pos] == ")":
                    pos += 1
                    break
                raise ValueError(f"Unexpected character at {pos}: {s[pos:pos+10]!r}")
        # name
        start = pos
        while pos < len(s) and s[pos] not in ",():;":
            pos += 1
        label = s[start:pos]  # the scan stops at ':', so label never holds one
        node.name = label or None
        if pos < len(s) and s[pos] == ":":
            pos += 1
            b0 = pos
            while pos < len(s) and s[pos] not in ",()":
                pos += 1
            try:
                node.branch_length = float(s[b0:pos])
            except ValueError:
                raise ValueError(f"Newick: expected a number after ':' at position {b0}") from None
        if children:
            if len(children) != 2:
                raise ValueError(f"Guide tree must be strictly bifurcating; found {len(children)} children")
            node.left, node.right = children
        return node

    root = parse_clade()
    if pos != len(s):
        raise ValueError(f"Trailing characters in Newick: {s[pos:]!r}")
    return root


def guide_tree_from_newick(text: str, names: list) -> Clade:
    """User-supplied guide tree: leaf names must biject with sequence names
    (tree/newick.rs:70-140)."""
    tree = parse_newick(text)
    leaves = [c for c in tree.postorder() if c.is_leaf()]
    leaf_names = [c.name for c in leaves]
    if sorted(leaf_names) != sorted(names):
        raise ValueError(
            f"Guide tree leaves do not match sequence names: tree has {sorted(leaf_names)}, input has {sorted(names)}"
        )
    idx = {n: i for i, n in enumerate(names)}
    for c in leaves:
        c.data = idx[c.name]
    return tree

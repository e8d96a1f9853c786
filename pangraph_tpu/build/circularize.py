"""Transitive-edge compaction: merge block pairs that are always adjacent with
consistent orientation across all paths.

Reference: circularize/circularize.rs, circularize_utils.rs, merge_blocks.rs.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pangraph_tpu.graph.graph import Block, Node, Pangraph
from pangraph_tpu.graph.seq import as_seq

FWD = "+"
REV = "-"


@dataclass(frozen=True)
class SimpleNode:
    bid: int
    strand: str

    def invert(self):
        return SimpleNode(self.bid, REV if self.strand == FWD else FWD)


@dataclass(frozen=True)
class Edge:
    """Orientation-canonical block adjacency (circularize_utils.rs:39-105)."""

    n1: SimpleNode
    n2: SimpleNode

    def invert(self):
        return Edge(self.n2.invert(), self.n1.invert())

    def canonical(self):
        # conventional_orientation: smaller bid first; forward first on equal bids
        if (self.n1.bid < self.n2.bid) or (self.n1.bid == self.n2.bid and self.n1.strand == FWD):
            return self
        return self.invert()

    def key(self):
        """Orientation-insensitive dict key (Edge PartialEq/Hash semantics)."""
        a = (self.n1, self.n2)
        b = (self.n2.invert(), self.n1.invert())
        return min(a, b, key=lambda t: (t[0].bid, t[0].strand, t[1].bid, t[1].strand))

    def same_as(self, other: "Edge") -> bool:
        return self.key() == other.key()

    def to_tuple(self):
        c = self
        return (c.n1.bid, c.n2.bid, 0 if c.n1.strand == FWD else 1, 0 if c.n2.strand == FWD else 1)


def path_edges(graph: Pangraph, path) -> list:
    nodes = [SimpleNode(graph.nodes[nid].block_id, graph.nodes[nid].strand) for nid in path.nodes]
    edges = [Edge(nodes[i], nodes[i + 1]) for i in range(len(nodes) - 1)]
    if path.circular and nodes:
        edges.append(Edge(nodes[-1], nodes[0]))
    return edges


def count_edges(graph: Pangraph) -> dict:
    counts = {}
    for path in graph.paths.values():
        for e in path_edges(graph, path):
            k = e.key()
            if k in counts:
                counts[k] = (counts[k][0], counts[k][1] + 1)
            else:
                counts[k] = (e, 1)
    return counts


def find_transitive_edges(graph: Pangraph) -> list:
    """Edges whose count equals both endpoint depths (circularize.rs:22-39)."""
    depths = {bid: b.depth() for bid, b in graph.blocks.items()}
    out = []
    for edge, count in count_edges(graph).values():
        b1, b2 = edge.n1.bid, edge.n2.bid
        if b1 != b2 and depths[b1] == count and depths[b2] == count:
            out.append(edge)
    return out


def remove_transitive_edges(graph: Pangraph) -> None:
    # circularize.rs:11-20
    while True:
        edges = find_transitive_edges(graph)
        if not edges:
            break
        merge_blocks(graph, edges[0])


# ------------------------------------------------------------------ merging
def orient_merging_edge(graph: Pangraph, edge: Edge) -> Edge:
    # merge_blocks.rs:33-47: longer consensus (tie: smaller id) is the anchor
    b1 = graph.blocks[edge.n1.bid]
    b2 = graph.blocks[edge.n2.bid]
    if b1.consensus_len() > b2.consensus_len() or (
        b1.consensus_len() == b2.consensus_len() and b1.id < b2.id
    ):
        return edge
    return edge.invert()


def find_node_pairings(graph: Pangraph, edge: Edge):
    # merge_blocks.rs:51-89
    pairings = {}
    new_nodes = {}
    for pid, path in graph.paths.items():
        n = len(path.nodes)
        limit = n if path.circular else n - 1
        for idx in range(limit):
            nid1 = path.nodes[idx]
            nid2 = path.nodes[(idx + 1) % n]
            node1 = graph.nodes[nid1]
            node2 = graph.nodes[nid2]
            sn1 = SimpleNode(node1.block_id, node1.strand)
            sn2 = SimpleNode(node2.block_id, node2.strand)
            e = Edge(sn1, sn2)
            if e.same_as(edge):
                pairings[nid1] = nid2
                pairings[nid2] = nid1
                new_s, new_e = node1.position[0], node2.position[1]
                new_strand = node1.strand if edge.n1 == sn1 else node2.strand
                new_node = Node.create(edge.n1.bid, pid, new_strand, (new_s, new_e))
                new_nodes[nid1] = new_node
                new_nodes[nid2] = new_node
    return pairings, new_nodes


def concatenate_alignments(bl1: Block, bl2: Block, node_map: dict, new_node_ids: dict, new_block_id: int) -> Block:
    # merge_blocks.rs:122-150
    assert bl1.depth() == bl2.depth(), "blocks must have the same depth"
    seq = np.concatenate([bl1.consensus, bl2.consensus])
    aln = {}
    for nid1, e1 in bl1.alignments.items():
        nid2 = node_map[nid1]
        e2 = bl2.alignments[nid2]
        aln[new_node_ids[nid1]] = e1.concat(e2.shift(bl1.consensus_len()))
    return Block(new_block_id, as_seq(seq), aln)


def merge_blocks(graph: Pangraph, edge: Edge) -> None:
    # merge_blocks.rs:15-31
    edge = orient_merging_edge(graph, edge)
    node_map, new_nodes = find_node_pairings(graph, edge)
    new_node_ids = {nid: n.id for nid, n in new_nodes.items()}

    b1 = graph.blocks[edge.n1.bid]
    b2 = graph.blocks[edge.n2.bid]
    if edge.n1.strand != edge.n2.strand:
        b2 = b2.reverse_complement()
    b_left, b_right = (b1, b2) if edge.n1.strand == FWD else (b2, b1)
    new_block = concatenate_alignments(b_left, b_right, node_map, new_node_ids, edge.n1.bid)

    # graph_merging_update (merge_blocks.rs:195-246)
    bid_left = edge.n1.bid
    del graph.blocks[edge.n1.bid]
    del graph.blocks[edge.n2.bid]
    graph.blocks[new_block.id] = new_block

    for path in graph.paths.values():
        out = []
        for nid in path.nodes:
            nn = new_nodes.get(nid)
            if nn is None:
                out.append(nid)
            elif graph.nodes[nid].block_id == bid_left:
                out.append(nn.id)
            # else: drop (the partner node of the pair)
        path.nodes = out

    for nid, n in new_nodes.items():
        if graph.nodes[nid].block_id == bid_left:
            graph.nodes[n.id] = n
        del graph.nodes[nid]

"""Junction-context GFA decomposition (reference:
pypangraph/export/junctions_to_gfa.py).

Blocks are paralog-split per junction: accessory blocks are renamed
``J{n}__{block_id}`` so the same block in two junction contexts becomes two
segments, while core anchor blocks stay single. The kept junction set comes
from a core-synteny scaffold policy: the per-edge majority backbone
("consensus"), one isolate's own core edges, or every junction ("all")."""
from __future__ import annotations

from collections import Counter, defaultdict

from pangraph_tpu.analysis.msu import core_paths


def _iso_core_edges(an_graph, L_thr: int) -> dict:
    """isolate -> frozenset of canonical core-edge string ids on its backbone."""
    return {
        iso: frozenset(e.to_str_id() for e in w.edges()) for iso, w in core_paths(an_graph, L_thr).items()
    }


def _consensus_edge_set(iso_edges: dict) -> set:
    """Core edges present in a strict majority of isolate backbones."""
    n = len(iso_edges)
    counts = Counter(e for edges in iso_edges.values() for e in edges)
    return {e for e, c in counts.items() if c > n / 2}


def _scaffold_edges(bj, scaffold: str) -> list:
    available = set(bj.edges())
    if scaffold == "all":
        return sorted(available)
    iso_edges = _iso_core_edges(bj.g, bj.L_thr)
    if scaffold == "consensus":
        chosen = _consensus_edge_set(iso_edges)
    elif scaffold in iso_edges:
        chosen = iso_edges[scaffold]
    else:
        raise ValueError(
            f"unknown scaffold isolate {scaffold!r}; expected 'consensus', 'all', or one of {sorted(iso_edges)}"
        )
    return sorted(chosen & available)


def junction_context_gfa(bj, scaffold: str = "consensus"):
    """Decompose the graph into a walkable junction-context GFA.

    Returns (segments, links, depths, prefix_map):
    - segments: dict segment name -> length (bp)
    - links: set of (name1, strand1, name2, strand2)
    - depths: segment name -> coverage (graph-wide count for core anchors,
      per-junction traversal count for accessory copies)
    - prefix_map: "J{n}" -> canonical edge string id
    """
    bdf = bj.g.to_blockstats_df()
    stats = {bid: (int(row["len"]), int(row["count"])) for bid, row in bdf.iterrows()}
    kept = _scaffold_edges(bj, scaffold)

    segments = {}
    core_counts = {}
    links = set()
    prefix_map = {}
    acc_depth = defaultdict(int)

    for n, edge_str in enumerate(kept):
        prefix = f"J{n}"
        prefix_map[prefix] = edge_str
        for junction in bj[edge_str].values():
            jc = junction.to_canonical()
            core_ids = {jc.left.id, jc.right.id}
            walk = [jc.left] + list(jc.center.oriented_blocks) + [jc.right]
            segment_walk = []
            for ob in walk:
                if ob.id in core_ids:
                    name = str(ob.id)
                else:
                    name = f"{prefix}__{ob.id}"
                    acc_depth[name] += 1
                segments[name] = stats[ob.id][0]
                core_counts[name] = stats[ob.id][1]
                segment_walk.append((name, ob.strand))
            for (n1, s1), (n2, s2) in zip(segment_walk, segment_walk[1:]):
                links.add((n1, s1, n2, s2))

    depths = {
        name: acc_depth[name] if name in acc_depth else core_counts[name] for name in segments
    }
    return segments, links, depths, prefix_map


def write_junction_gfa(path, segments, links, depths) -> None:
    """Serialize the decomposition as GFA v1 (S/L lines, RC/LN tags)."""
    from pangraph_tpu.io.files import create_maybe_compressed

    def s_ori(strand) -> str:
        return "+" if strand in (True, "+") else "-"

    with create_maybe_compressed(path, "wt") as f:
        f.write("H\tVN:Z:1.0\n")
        for name in sorted(segments):
            f.write(f"S\t{name}\t*\tLN:i:{segments[name]}\tRC:i:{depths[name]}\n")
        for n1, st1, n2, st2 in sorted(links, key=lambda t: (str(t[0]), str(t[2]))):
            f.write(f"L\t{n1}\t{s_ori(st1)}\t{n2}\t{s_ori(st2)}\t*\n")

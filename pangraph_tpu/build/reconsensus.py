"""Post-merge consensus maintenance.

Reference: reconsensus/reconsensus.rs + remove_nodes.rs + pangraph/detach_unaligned.rs.
After mergers, majority substitutions are folded into the consensus in place;
majority indels trigger a consensus rewrite + full re-alignment of the block;
nodes whose alignments have zero aligned positions are detached into singleton
blocks (keeping their node ids so paths are untouched).
"""
from __future__ import annotations

from pangraph_tpu.align.params import BandParameters
from pangraph_tpu.graph.edits import Edit
from pangraph_tpu.graph.graph import Block, Node, Pangraph
from pangraph_tpu.graph.seq import revcomp
from pangraph_tpu.utils.ids import content_id

FWD = "+"


# ---------------------------------------------------------------- empty nodes
def find_empty_nodes(graph: Pangraph, block_ids: list) -> list:
    # remove_nodes.rs:12-40: deletion-only edits covering the whole consensus
    out = []
    for bid in block_ids:
        block = graph.blocks[bid]
        L = block.consensus_len()
        for nid, e in block.alignments.items():
            if e.inss or e.subs or not e.dels:
                continue
            if sum(d.len for d in e.dels) == L:
                out.append(nid)
    return out


def remove_nodes_from_graph(graph: Pangraph, node_ids: list) -> None:
    # remove_nodes.rs:42-60
    for nid in node_ids:
        node = graph.nodes.pop(nid)
        path = graph.paths[node.path_id]
        path.nodes.remove(nid)
        graph.blocks[node.block_id].alignments.pop(nid, None)


# ------------------------------------------------------------- detach unaligned
def detach_unaligned_nodes(blocks: list, nodes_dict: dict) -> None:
    """Indel-only nodes become singleton blocks, same node id
    (detach_unaligned.rs:24-115). Mutates `blocks` and `nodes_dict`."""
    orphans = []
    for block in blocks:
        cons_len = block.consensus_len()
        removed = [nid for nid, e in block.alignments.items() if e.aligned_count(cons_len) == 0]
        for nid in removed:
            e = block.alignments.pop(nid)
            orphans.append((nid, e.apply(block.consensus)))
    for nid, seq in orphans:
        old_node = nodes_dict.pop(nid)
        if old_node.strand != FWD:
            seq = revcomp(seq)
        new_bid = content_id("detached", nid, seq)
        new_block = Block.from_consensus(seq, new_bid, nid)
        new_node = Node(nid, new_bid, old_node.path_id, FWD, old_node.position)
        blocks.append(new_block)
        nodes_dict[nid] = new_node


# ----------------------------------------------------------------- reconsensus
def reconsensus_graph(graph: Pangraph, block_ids: list, args, aligner=None) -> None:
    """reconsensus.rs:32-118."""
    assert not find_empty_nodes(graph, block_ids), "empty nodes present before reconsensus"

    mutations_only = []
    need_realignment = []
    for bid in block_ids:
        block = graph.blocks[bid]
        maj = block.find_majority_edits()
        if maj.has_indels():
            need_realignment.append((bid, maj))
        elif maj.has_subs():
            mutations_only.append((bid, maj))

    for bid, maj in mutations_only:
        graph.blocks[bid].apply_majority_substitutions(maj.subs)

    if need_realignment:
        if aligner is not None and hasattr(aligner, "align_many"):
            realigned = _realign_blocks_batched(graph, need_realignment, aligner)
        else:
            realigned = []
            for bid, maj in need_realignment:
                block = graph.blocks.pop(bid)
                realigned.append(edit_consensus_and_realign(block, maj, args, aligner))
        detach_unaligned_nodes(realigned, graph.nodes)
        for block in realigned:
            graph.blocks[block.id] = block


def _realign_blocks_batched(graph: Pangraph, need_realignment: list, aligner) -> list:
    """Batch every realignment job across all blocks into one aligner call."""
    from pangraph_tpu.ops.batch_align import AlignJob

    prepared = []  # (block_id, new_consensus, [(nid, seq, band)])
    all_jobs = []
    owners = []
    for bi, (bid, maj) in enumerate(need_realignment):
        block = graph.blocks.pop(bid)
        new_consensus = maj.apply(block.consensus)
        assert len(new_consensus) > 0, "Consensus cannot be empty"
        band = BandParameters.from_edits(maj, block.consensus_len())
        jobs = []
        from pangraph_tpu.align.jobsplit import SEG, split_by_prior

        for nid, e in block.alignments.items():
            seq = e.apply(block.consensus)
            old_band = BandParameters.from_edits(e, block.consensus_len())
            upd = BandParameters(old_band.mean_shift - band.mean_shift, old_band.band_width + band.band_width)
            # pin-split vs the prior structure: maj maps old->new consensus
            # (the job ref), e maps old consensus -> seq (align/jobsplit.py)
            segments = None
            if block.consensus_len() > 2 * SEG:
                segments = split_by_prior(
                    maj, [e], block.consensus_len(), len(new_consensus), len(seq)
                )
            jobs.append((nid, seq, upd))
            all_jobs.append(AlignJob(new_consensus, seq, upd, segments=segments))
            owners.append((bi, nid))
        prepared.append((bid, new_consensus, jobs))
    edits_list = aligner.align_many(all_jobs) if all_jobs else []
    per_block = [dict() for _ in prepared]
    for (bi, nid), e in zip(owners, edits_list):
        per_block[bi][nid] = e
    return [Block(bid, cons, per_block[bi]) for bi, (bid, cons, _) in enumerate(prepared)]


def edit_consensus_and_realign(block: Block, edits: Edit, args, aligner=None) -> Block:
    """Apply majority edits to the consensus, re-map every sequence with a band
    derived from old alignment + consensus displacement
    (pangraph_block.rs:295-345)."""
    from pangraph_tpu.align.map_variations import map_variations

    new_consensus = edits.apply(block.consensus)
    assert len(new_consensus) > 0, "Consensus cannot be empty"
    band = BandParameters.from_edits(edits, block.consensus_len())

    jobs = []
    for nid, e in block.alignments.items():
        seq = e.apply(block.consensus)
        assert len(seq) > 0, "Aligned sequence cannot be empty"
        old_band = BandParameters.from_edits(e, block.consensus_len())
        upd = BandParameters(old_band.mean_shift - band.mean_shift, old_band.band_width + band.band_width)
        jobs.append((nid, seq, upd))

    if aligner is not None:
        edits_list = aligner(new_consensus, [s for _, s, _ in jobs], [b for _, _, b in jobs])
    else:
        edits_list = [
            map_variations(new_consensus, seq, b, args.banded_params, args.extra_band_width)
            for _, seq, b in jobs
        ]
    new_alignments = {nid: e for (nid, _, _), e in zip(jobs, edits_list)}
    return Block(block.id, new_consensus, new_alignments)

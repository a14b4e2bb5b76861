"""GAF record emission for read-to-graph alignment.

Output is byte-identical to the reference (``src/io/gaf.rs:119-304``).
``NodeSegmentResolver`` here precomputes a node -> (segment, position) table
once — O(nodes) total — fixing the reference's O(graph)-per-node linear
rescan (``src/io/gaf.rs:32-54``), a known scaling weakness in its read
mapper hot loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..aligner.alignment import Alignment
from .gfa import GraphSegments


class NodeSegmentResolver:
    def __init__(self, graph, segments: GraphSegments) -> None:
        self._table: Dict[int, Tuple[int, int]] = {}
        for segment_ix, (start, end) in enumerate(
            zip(segments.start_nodes, segments.end_nodes)
        ):
            curr = start
            pos = 0
            while True:
                self._table[curr] = (segment_ix, pos)
                if curr == end:
                    break
                curr = next(graph.successors(curr), None)
                if curr is None:
                    break
                pos += 1

    def resolve(self, node: int) -> Optional[Tuple[int, int]]:
        return self._table.get(node)


@dataclass
class GAFRecord:
    query_name: str
    query_length: int
    query_start: int
    query_end: int
    strand: str
    graph_path: str
    path_length: int
    path_aln_start: int
    path_aln_end: int
    num_matches: int
    aln_block_len: int
    mapping_quality: int
    additional_fields: List[Tuple[str, str, str]] = field(default_factory=list)

    def __str__(self) -> str:
        fields_str = "".join(
            f"\t{tag}:{typ}:{val}" for tag, typ, val in self.additional_fields
        ).strip()
        return (
            f"{self.query_name}\t{self.query_length}\t{self.query_start}\t"
            f"{self.query_end}\t{self.strand}\t{self.graph_path}\t"
            f"{self.path_length}\t{self.path_aln_start}\t{self.path_aln_end}\t"
            f"{self.num_matches}\t{self.aln_block_len}\t{self.mapping_quality}\t"
            f"{fields_str}"
        )


def alignment_to_gaf(
    graph,
    graph_segments: GraphSegments,
    seq_name: str,
    sequence: bytes,
    alignment: Alignment,
    resolver: NodeSegmentResolver,
) -> Optional[GAFRecord]:
    """Build a GAF record from an alignment (reference: ``gaf.rs:152-304``)."""
    if not alignment or not any(p.is_aligned() for p in alignment):
        # no aligned pair: there is no graph path to report (the
        # reference would panic indexing an empty segment list here)
        return None

    query_start = 0
    path_aln_start = 0
    path_segments: List[int] = []
    cigar_ops: List[str] = []

    at_aln_start = True
    last_match_segment_ix = 0
    last_match_segment_pos = 0
    num_matches = 0

    for pair in alignment:
        if at_aln_start:
            if pair.is_insertion():
                query_start += 1
            elif pair.is_aligned():
                seg = resolver.resolve(pair.rpos)
                if seg is None:
                    raise ValueError("node not found in any segment")
                segment_ix, segment_pos = seg
                path_aln_start = segment_pos
                path_segments.append(segment_ix)
                if graph.is_symbol_equal(pair.rpos, sequence[pair.qpos]):
                    num_matches += 1
                    cigar_ops.append("=")
                else:
                    cigar_ops.append("X")
                at_aln_start = False
                last_match_segment_ix = len(path_segments) - 1
                last_match_segment_pos = segment_pos
        else:
            if pair.is_aligned():
                seg = resolver.resolve(pair.rpos)
                if seg is None:
                    raise ValueError("node not found in any segment")
                segment_ix, segment_pos = seg
                if not path_segments or path_segments[-1] != segment_ix:
                    path_segments.append(segment_ix)
                if graph.is_symbol_equal(pair.rpos, sequence[pair.qpos]):
                    num_matches += 1
                    cigar_ops.append("=")
                else:
                    cigar_ops.append("X")
                last_match_segment_ix = len(path_segments) - 1
                last_match_segment_pos = segment_pos
            elif pair.rpos is not None:
                seg = resolver.resolve(pair.rpos)
                if seg is None:
                    raise ValueError("node not found in any segment")
                segment_ix, _ = seg
                if not path_segments or path_segments[-1] != segment_ix:
                    path_segments.append(segment_ix)
                cigar_ops.append("D")
            elif pair.qpos is not None:
                cigar_ops.append("I")

    graph_path = "".join(
        f">{graph_segments.names[s]}" for s in path_segments[: last_match_segment_ix + 1]
    )
    path_length = sum(
        graph_segments.segment_lengths[s]
        for s in path_segments[: last_match_segment_ix + 1]
    )
    path_aln_end = (
        path_length
        - graph_segments.segment_lengths[path_segments[last_match_segment_ix]]
        + last_match_segment_pos
    )

    query_end = next(p.qpos for p in reversed(alignment) if p.is_aligned())

    # RLE over cigar ops; trailing indel dropped (reference: gaf.rs:265-275)
    cigar_rle: List[Tuple[str, int]] = []
    for op in cigar_ops:
        if cigar_rle and cigar_rle[-1][0] == op:
            cigar_rle[-1] = (op, cigar_rle[-1][1] + 1)
        else:
            cigar_rle.append((op, 1))
    if cigar_rle and cigar_rle[-1][0] in ("I", "D"):
        cigar_rle.pop()

    aln_block_len = sum(count for _, count in cigar_rle)
    cigar_string = "".join(f"{count}{op}" for op, count in cigar_rle)

    return GAFRecord(
        query_name=seq_name,
        query_length=len(sequence),
        query_start=query_start,
        query_end=query_end,
        strand="+",
        graph_path=graph_path,
        path_length=path_length,
        path_aln_start=path_aln_start,
        path_aln_end=path_aln_end,
        num_matches=num_matches,
        aln_block_len=aln_block_len,
        mapping_quality=60,
        additional_fields=[("cg", "Z", cigar_string)],
    )

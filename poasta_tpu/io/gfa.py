"""GFA v1/v1.1 parsing and emission.

Emitters compress unbranching node runs into segments via BFS from the start
node and write L-links in edge-slot order plus per-sequence W-walks (v1.1) or
P-lines (v1) — byte-identical to the reference
(``src/io/graph.rs:245-502``, parser: ``src/io/gfa.rs:29-358``).
"""

from __future__ import annotations

import gzip
from collections import deque
from dataclasses import dataclass, field
from typing import IO, Dict, List, Optional, Tuple

from ..graphs.poa import POAGraph
from ..utils.errors import GraphError


@dataclass
class Segment:
    sid: str
    sequence: Optional[str]


@dataclass
class Link:
    sid1: str
    strand1: str
    sid2: str
    strand2: str
    overlap: Optional[str]


@dataclass
class GraphSegments:
    names: List[str] = field(default_factory=list)
    start_nodes: List[int] = field(default_factory=list)
    end_nodes: List[int] = field(default_factory=list)
    segment_lengths: List[int] = field(default_factory=list)


def parse_gfa_line(line: str):
    parts = line.rstrip().split("\t")
    kind = parts[0]
    if kind == "S":
        if len(parts) < 3:
            raise ValueError("segment line missing fields")
        seq = parts[2].upper() if parts[2] != "*" else None
        return Segment(parts[1], seq)
    if kind == "L":
        if len(parts) < 6:
            raise ValueError("link line missing fields")
        overlap = None if parts[5] == "*" else parts[5]
        return Link(parts[1], parts[2], parts[3], parts[4], overlap)
    return None


def load_graph_from_gfa(path) -> Tuple[POAGraph, GraphSegments]:
    """Build a POA graph from GFA segments + forward-strand links.

    Reference: ``src/io/graph.rs:125-227``.
    """
    opener = gzip.open if str(path).endswith(".gz") else open
    graph = POAGraph()
    segments = GraphSegments()
    name_to_ix: Dict[str, int] = {}
    links_to_add: List[Link] = []

    with opener(path, "rt") as fh:
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            try:
                parsed = parse_gfa_line(line)
            except ValueError as exc:
                # unknown record types are skipped per the GFA spec, but a
                # malformed S/L line means the file is broken — fail loudly
                # instead of silently building a partial graph
                raise GraphError(f"malformed GFA line: {line[:80]!r} ({exc})")
            if isinstance(parsed, Segment):
                if parsed.sequence is None:
                    continue
                seq = parsed.sequence.encode()
                weights = [1] * len(seq)
                res = graph.add_nodes_for_sequence(seq, weights, 0, len(seq))
                if res is None:
                    raise GraphError(f"empty segment {parsed.sid}")
                start, end = res
                name_to_ix[parsed.sid] = len(segments.names)
                segments.names.append(parsed.sid)
                segments.start_nodes.append(start)
                segments.end_nodes.append(end)
                segments.segment_lengths.append(len(seq))
            elif isinstance(parsed, Link):
                if parsed.strand1 == "-" or parsed.strand2 == "-":
                    raise GraphError("reverse-strand GFA links are not supported")
                if parsed.sid1 in name_to_ix and parsed.sid2 in name_to_ix:
                    frm = segments.end_nodes[name_to_ix[parsed.sid1]]
                    to = segments.start_nodes[name_to_ix[parsed.sid2]]
                    graph.add_edge(frm, to, 0, 1)
                else:
                    links_to_add.append(parsed)

    for link in links_to_add:
        if link.sid1 in name_to_ix and link.sid2 in name_to_ix:
            frm = segments.end_nodes[name_to_ix[link.sid1]]
            to = segments.start_nodes[name_to_ix[link.sid2]]
            graph.add_edge(frm, to, 0, 1)
        else:
            # silently dropping a link to an undefined segment would build
            # a disconnected graph with no warning — fail like malformed
            # lines do
            missing = link.sid1 if link.sid1 not in name_to_ix else link.sid2
            raise GraphError(f"GFA link references undefined segment "
                             f"{missing!r}")

    graph.post_process()
    return graph, segments


# -- emission ---------------------------------------------------------------


def _compress_segments(graph: POAGraph):
    """BFS segment compression shared by the GFA v1/v1.1 emitters.

    Returns (segment_sequences, node_to_segment, segment_starts,
    segment_ends, segment_lengths).  Replicates the reference's traversal
    order and its seg-pos assignment (``src/io/graph.rs:249-315``).
    """
    visited = {graph.start_node}
    queue = deque([graph.start_node])

    node_to_segment: Dict[int, Tuple[int, int]] = {}
    segment_starts: Dict[int, int] = {}
    segment_ends: Dict[int, int] = {}
    segment_lengths: Dict[int, int] = {}
    segment_seqs: List[bytes] = []
    curr_segment_id = 0

    while queue:
        front = queue.popleft()
        if front == graph.start_node:
            for succ in graph.successors(front):
                if succ not in visited:
                    queue.append(succ)
                    visited.add(succ)
        else:
            segment = bytearray([graph.get_symbol(front)])
            curr_node = front
            curr_out_degree = graph.out_degree(front)

            seg_pos = 0
            node_to_segment[front] = (curr_segment_id, seg_pos)
            segment_starts[front] = curr_segment_id
            while curr_out_degree == 1:
                next_node = next(graph.successors(curr_node))
                if graph.in_degree(next_node) == 1 and next_node != graph.end_node:
                    segment.append(graph.get_symbol(next_node))
                    node_to_segment[next_node] = (curr_segment_id, seg_pos)
                else:
                    break
                curr_node = next_node
                curr_out_degree = graph.out_degree(curr_node)
                seg_pos += 1

            segment_seqs.append(bytes(segment))
            segment_ends[curr_node] = curr_segment_id
            segment_lengths[curr_segment_id] = len(segment)
            visited.add(curr_node)

            for succ in graph.successors(curr_node):
                if succ not in visited and succ != graph.end_node:
                    visited.add(succ)
                    queue.append(succ)

            curr_segment_id += 1

    return segment_seqs, node_to_segment, segment_starts, segment_ends, segment_lengths


def _seq_walk(graph: POAGraph, seq_id: int, start_node: int, node_to_segment):
    """Follow a sequence's edge chain; returns (segments, last_pos)."""
    curr = start_node
    prev_segment, _ = node_to_segment[start_node]
    walk_segments = [prev_segment]
    last_pos = 0

    while curr is not None:
        node_segment, last_pos = node_to_segment[curr]
        if node_segment != prev_segment:
            walk_segments.append(node_segment)
        nxt = None
        for edge in graph.out_edges(curr):
            if seq_id in edge.sequence_ids:
                nxt = edge.target
        prev_segment = node_segment
        curr = nxt

    return walk_segments, last_pos


def graph_to_gfa(graph: POAGraph, out: IO[str]) -> None:
    """GFA v1.1 with W-lines (reference: ``src/io/graph.rs:245-372``)."""
    out.write("H\tVN:Z:1.1\n")
    seqs, node_to_segment, seg_starts, seg_ends, seg_lengths = _compress_segments(graph)
    for sid, seq in enumerate(seqs):
        out.write(f"S\ts{sid}\t{seq.decode()}\n")

    for edge in graph.edge_references():
        if edge.source in seg_ends and edge.target in seg_starts:
            out.write(f"L\ts{seg_ends[edge.source]}\t+\ts{seg_starts[edge.target]}\t+\t0M\n")

    for seq_id, seq_info in enumerate(graph.sequences):
        start_segment, start_pos = node_to_segment[seq_info.start_node]
        walk_segments, last_pos = _seq_walk(graph, seq_id, seq_info.start_node, node_to_segment)
        total = sum(seg_lengths[s] for s in walk_segments)
        end_pos = total - seg_lengths[walk_segments[-1]] + last_pos
        path = "".join(f">s{s}" for s in walk_segments)
        out.write(f"W\t*\t0\t{seq_info.name}\t{start_pos}\t{end_pos}\t{path}\n")


def graph_to_gfav1(graph: POAGraph, out: IO[str]) -> None:
    """GFA v1 with P-lines (reference: ``src/io/graph.rs:374-502``)."""
    out.write("H\tVN:Z:1.1\n")
    seqs, node_to_segment, seg_starts, seg_ends, seg_lengths = _compress_segments(graph)
    for sid, seq in enumerate(seqs):
        out.write(f"S\t{sid + 1}\t{seq.decode()}\n")

    for edge in graph.edge_references():
        if edge.source in seg_ends and edge.target in seg_starts:
            out.write(f"L\t{seg_ends[edge.source] + 1}\t+\t{seg_starts[edge.target] + 1}\t+\t0M\n")

    for seq_id, seq_info in enumerate(graph.sequences):
        walk_segments, _ = _seq_walk(graph, seq_id, seq_info.start_node, node_to_segment)
        names = ",".join(f"{s + 1}+" for s in walk_segments)
        out.write(f"P\t{seq_info.name}\t{names}\t*\n")

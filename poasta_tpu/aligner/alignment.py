"""Alignment representation shared by the aligner engines and the graph.

Reference: ``src/aligner/alignment.rs``.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional


class AlignedPair(NamedTuple):
    """One column of a pairwise (graph, query) alignment.

    ``rpos`` is a graph node index (or ``None`` for an insertion into the
    graph), ``qpos`` a 0-based query offset (or ``None`` for a deletion).

    NamedTuple rather than a dataclass: serving-path alignments carry
    thousands of pairs per read and tuple construction is ~5x cheaper
    than frozen-dataclass construction (measured on the anchored
    corridor path, where pair materialization briefly dominated).
    """

    rpos: Optional[int]
    qpos: Optional[int]

    def is_aligned(self) -> bool:
        return self.rpos is not None and self.qpos is not None

    def is_indel(self) -> bool:
        return not self.is_aligned()

    def is_deletion(self) -> bool:
        return self.rpos is None and self.qpos is not None

    def is_insertion(self) -> bool:
        return self.rpos is not None and self.qpos is None


Alignment = List[AlignedPair]


def print_alignment(graph, sequence: bytes, aln: Alignment) -> str:
    """Three-row pretty printer (reference: ``alignment.rs:42-78``)."""
    graph_chars: List[str] = []
    aln_chars: List[str] = []
    query_chars: List[str] = []

    for pair in aln:
        if pair.is_aligned():
            node = graph.get_symbol_char(pair.rpos)
            qry = chr(sequence[pair.qpos])
            graph_chars.append(node)
            aln_chars.append("|" if node == qry else "·")
            query_chars.append(qry)
        elif pair.rpos is not None:
            graph_chars.append(graph.get_symbol_char(pair.rpos))
            aln_chars.append(" ")
            query_chars.append("-")
        elif pair.qpos is not None:
            graph_chars.append("-")
            aln_chars.append(" ")
            query_chars.append(chr(sequence[pair.qpos]))

    return "{}\n{}\n{}".format("".join(graph_chars), "".join(aln_chars), "".join(query_chars))

"""Reference test fixtures transcribed as literal edge/node lists.

Every graph below is a verbatim transcription of a JUnit fixture in
/root/reference/tests (citations inline; also catalogued in
/root/repo/FIXTURES.md). Node names map to dense ids in creation order,
mirroring the reference IdMap (`core/.../core/IdMap.java:36-53`).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# PageRank "Label1/TYPE1" fixture — tests/.../impl/PageRankTest.java:64-143
# nodes a..j => ids 0..9; TYPE1 edges only (TYPE2 filtered out by the proc)
PAGERANK_NODES = list("abcdefghij")
PAGERANK_EDGES = [  # (src, dst)
    ("b", "c"), ("c", "b"),
    ("d", "a"), ("d", "b"),
    ("e", "b"), ("e", "d"), ("e", "f"),
    ("f", "b"), ("f", "e"),
]
# expected at damping=0.85, 40 iterations (PageRankTest.java:130-143; tol 1e-2)
PAGERANK_EXPECTED = {
    "a": 0.243007, "b": 1.9183995, "c": 1.7806315, "d": 0.21885,
    "e": 0.243007, "f": 0.21885, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15,
}

# PageRank wiki fixture with dangling node — PageRankWikiTest.java:61-141
PAGERANK_WIKI_NODES = list("abcdefghijk")
PAGERANK_WIKI_EDGES = [
    ("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"),
    ("e", "b"), ("e", "d"), ("e", "f"),
    ("f", "b"), ("f", "e"),
    ("g", "b"), ("g", "e"), ("h", "b"), ("h", "e"),
    ("i", "b"), ("i", "e"), ("j", "e"), ("k", "e"),
]
PAGERANK_WIKI_EXPECTED = {
    "a": 0.3040965, "b": 3.5658695, "c": 3.180981, "d": 0.3625935,
    "e": 0.7503465, "f": 0.3625935,
    "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15, "k": 0.15,
}

# ---------------------------------------------------------------------------
# UnionFind proc fixture — tests/.../algo/UnionFindProcIntegrationTest.java:54-171
# 10 nodes A..J (J isolated). Edge D->E carries weight 4.2; others default 10.0
UNIONFIND_NODES = list("ABCDEFGHIJ")
UNIONFIND_EDGES = [  # (src, dst, weight)
    ("A", "B", 10.0), ("B", "C", 10.0), ("C", "D", 10.0),
    ("D", "E", 4.2),
    ("E", "F", 10.0), ("F", "G", 10.0),
    ("H", "I", 10.0),
]
# expected: plain => setCount 3, sizes {7,2,1}; threshold 5.0 drops D->E =>
# sizes {4,3,2,1}; threshold 3.14 keeps it => {7,2,1} (:111-171)

# UnionFind partition-consistency fixture — impl/UnionFindsTest.java:54-107:
# 16 disjoint 10-node chains, ids 0..159, chain k = ids 10k..10k+9
UNIONFIND_LINES_EDGES = [
    (10 * k + i, 10 * k + i + 1) for k in range(16) for i in range(9)
]

# ---------------------------------------------------------------------------
# Label propagation seeded fixture —
# tests/.../algo/LabelPropagationProcIntegrationTest.java:49-63
# (id, partition); edges carry explicit weights
LPA_NODES = [  # (id, partition)
    (0, 42), (1, 42),
    (2, 1), (3, 1), (4, 1), (5, 1),
    (6, 2),
    (7, 1), (8, 1), (9, 1), (10, 1),
    (11, 2),
]
LPA_EDGES = [  # (src, dst, weight): a->followers, b->followers
    (0, 2, 1.0), (0, 3, 2.0), (0, 4, 1.0), (0, 5, 1.0), (0, 6, 8.0),
    (1, 7, 1.0), (1, 8, 2.0), (1, 9, 1.0), (1, 10, 1.0), (1, 11, 8.0),
]
# expected: OUTGOING, 1 iteration => nodes 0 and 1 adopt partition 2
# (weight 8 beats 1+2+1+1=5), :117-137

# LPA convergence fixture — impl/LabelPropagation420Test.java:84-100
LPA420_NODES = [(0, 2), (1, 3), (2, 4), (3, 3), (4, 4), (5, 2)]
LPA420_EDGES = [
    (0, 1), (0, 2), (4, 3), (1, 5), (3, 4), (5, 0), (0, 5), (1, 0), (5, 1), (2, 3),
]
# expected converged communities: {0,1,5} and {2,3,4} (:153-178)

# ---------------------------------------------------------------------------
# Triangle fixtures — tests/.../algo/TriangleProcTest.java:44-99
# creation order a,f,c,e,i,b,h,d,g => ids below; undirected edges
TRIANGLE_NODE_IDS = {"a": 0, "f": 1, "c": 2, "e": 3, "i": 4, "b": 5, "h": 6, "d": 7, "g": 8}
TRIANGLE_EDGES = [  # (name pairs)
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "h"),
    ("d", "e"), ("e", "f"), ("f", "d"),
    ("b", "d"),
    ("g", "h"), ("h", "i"), ("i", "g"),
]
# expected: global 3 triangles; every node exactly 1 (:139-149);
# triples {a,b,c},{d,e,f},{g,h,i} (:206-219)

# clustering-coefficient wiki graph — impl/ClusteringCoefficientWikiTest.java:38-103
CCOEF_NODES = list("abcd")  # ids 0..3
CCOEF_EDGES = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "d")]
CCOEF_EXPECTED = {"a": 1 / 3, "b": 1.0, "c": 0.0, "d": 1.0}
CCOEF_AVG = 0.583  # ±0.01


def name_edges_to_ids(edges, names=None, ids=None):
    """(nameA, nameB[, w]) -> (idA, idB[, w]) using creation order."""
    if ids is None:
        ids = {n: i for i, n in enumerate(names)}
    out = []
    for e in edges:
        s, d, *w = e
        out.append((ids[s], ids[d], *w))
    return out

"""GraphML export of the materialized knowledge graph.

Downstream graph stores and viewers (Gephi, NetworkX, Neo4j importers)
speak GraphML; this sink serializes the ``graph_tables`` output —
nodes (entity_id, surface, entity_type, n_occurrences) and edges
(subj_id, pred, obj_id, n_support, score_max) — as one standards-
conformant XML document (graphml.graphdrawing.org/specification).

Scale contract: the node/edge tables are the VOCABULARY-BOUNDED
artifacts of the pipeline (see ``pipelines/kg.graph_tables``), so a
single-file export is the right default; the writer still streams
row-by-row through a file handle (never builds the document in
memory). All attribute values are XML-escaped.

Reference parity: jerex exports examples as HTML
(`jerex/evaluation/scoring.py` store_examples); this is the engine's
graph-native counterpart for the "graph materialize" north-rule step.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import pandas as pd

_HEADER = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="surface" for="node" attr.name="surface" attr.type="string"/>
  <key id="entity_type" for="node" attr.name="entity_type" attr.type="string"/>
  <key id="n_occurrences" for="node" attr.name="n_occurrences" attr.type="long"/>
  <key id="pred" for="edge" attr.name="pred" attr.type="string"/>
  <key id="n_support" for="edge" attr.name="n_support" attr.type="long"/>
  <key id="score_max" for="edge" attr.name="score_max" attr.type="double"/>
  <graph id="kg" edgedefault="directed">
"""


def write_graphml(nodes: pd.DataFrame, edges: pd.DataFrame,
                  path: str) -> None:
    """Serialize node/edge frames to a GraphML file at ``path``."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(_HEADER)
        for r in nodes.itertuples(index=False):
            f.write(
                f'    <node id="{escape(str(r.entity_id))}">\n'
                f'      <data key="surface">{escape(str(r.surface))}'
                "</data>\n"
                f'      <data key="entity_type">'
                f"{escape(str(r.entity_type))}</data>\n"
                f'      <data key="n_occurrences">'
                f"{int(r.n_occurrences)}</data>\n"
                "    </node>\n")
        for i, r in enumerate(edges.itertuples(index=False)):
            f.write(
                f'    <edge id="e{i}" '
                f'source="{escape(str(r.subj_id))}" '
                f'target="{escape(str(r.obj_id))}">\n'
                f'      <data key="pred">{escape(str(r.pred))}</data>\n'
                f'      <data key="n_support">{int(r.n_support)}'
                "</data>\n"
                f'      <data key="score_max">{float(r.score_max)!r}'
                "</data>\n"
                "    </edge>\n")
        f.write("  </graph>\n</graphml>\n")


def read_graphml_counts(path: str) -> tuple:
    """Cheap structural check: (n_nodes, n_edges) parsed back from a
    GraphML file (used by tests and the CLI summary)."""
    import xml.etree.ElementTree as ET
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    root = ET.parse(path).getroot()
    graph = root.find(f"{ns}graph")
    return (len(graph.findall(f"{ns}node")),
            len(graph.findall(f"{ns}edge")))

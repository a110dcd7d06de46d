"""TP/FP/FN examples report (S8 analogue).

The reference renders a Jinja2 HTML of true/false positives and false
negatives per document (``/root/reference/jerex/evaluation/
joint_evaluator.py:137-180`` + ``examples.html`` template). Jinja isn't
required for the same artifact: this renderer emits a small static HTML
with one section per conversation, triples colored by outcome. Meant
for fixture-scale outputs (``limit`` bounds the conversations shown).
"""

from __future__ import annotations

import html

import pandas as pd

_KEY = ["subj", "pred", "obj"]

_STYLE = """
body { font-family: sans-serif; margin: 2em; }
.conv { margin-bottom: 1.5em; border: 1px solid #ccc; padding: 1em; }
.tp { color: #1a7f37; } .fp { color: #b35900; } .fn { color: #cf222e; }
h2 { font-size: 1.05em; margin: 0 0 .5em; }
li { margin: .1em 0; }
"""


def write_examples_report(pred: pd.DataFrame, gt: pd.DataFrame,
                          out_path: str, *, limit: int = 50) -> str:
    """Render TP (both), FP (pred only), FN (gt only) triples per conv."""
    convs = sorted(set(pred["conv_id"]) | set(gt["conv_id"]))[:limit]
    pred_by = {c: set(map(tuple, g[_KEY].values))
               for c, g in pred.groupby("conv_id")}
    gt_by = {c: set(map(tuple, g[_KEY].values))
             for c, g in gt.groupby("conv_id")}

    parts = [f"<html><head><style>{_STYLE}</style></head><body>",
             "<h1>Triple extraction examples</h1>"]
    n_tp = n_fp = n_fn = 0
    for conv in convs:
        p = pred_by.get(conv, set())
        g = gt_by.get(conv, set())
        tp, fp, fn = sorted(p & g), sorted(p - g), sorted(g - p)
        n_tp += len(tp); n_fp += len(fp); n_fn += len(fn)
        parts.append(f'<div class="conv"><h2>{html.escape(conv)}</h2><ul>')
        for cls, items in (("tp", tp), ("fp", fp), ("fn", fn)):
            for s, r, o in items:
                parts.append(
                    f'<li class="{cls}">[{cls.upper()}] '
                    f'{html.escape(s)} —{html.escape(r)}→ '
                    f'{html.escape(o)}</li>')
        parts.append("</ul></div>")
    parts.insert(2, f"<p>TP {n_tp} · FP {n_fp} · FN {n_fn} "
                    f"(first {len(convs)} conversations)</p>")
    parts.append("</body></html>")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path

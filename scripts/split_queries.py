"""One-shot mechanical splitter: ``jerex_ray/pipelines/queries.py``
(27k lines) → the ``jerex_ray/pipelines/queries/`` package, zero
behavior change (round-4 governance item; VERDICT r03 'Next round' #6).

Method: AST the monolith, seed every query function with a domain from
its registry name, fixed-point-propagate domains through the top-level
reference graph; helpers referenced from several domains (or several
size-balanced parts of one domain) land in ``_shared``. Each part
module carries its units in original source order plus its slice of
the QUERIES / ORACLES registries; ``__init__`` merges every part's
namespace so all existing ``from jerex_ray.pipelines.queries import
<anything>`` imports keep working, underscore helpers included.

Usage: python scripts/split_queries.py <outdir>

HISTORICAL ARTIFACT: the monolith no longer exists in the working
tree — regenerate its source first if you ever need to re-run:
``git show cef5ea7^:jerex_ray/pipelines/queries.py > /tmp/queries_orig.py``.
Kept for split-methodology review, not for routine use.
"""

from __future__ import annotations

import ast
import os
import sys
from collections import defaultdict

SRC = "/tmp/queries_orig.py"
PART_BUDGET = 1900          # lines of units per part, before registries

DOMAIN_ORDER = ["kg", "docs", "events", "users", "embed", "tpch"]


def domain_of(q: str) -> str:
    if q.startswith(("kg_", "media_")):
        return "kg"
    if q.startswith(("doc_", "dedup_", "ann_")):
        return "docs"
    if q.startswith("q_events_"):
        return "events"
    if q.startswith("q_user_"):
        return "users"
    if q.startswith("emb_"):
        return "embed"
    return "tpch"


def main(outdir: str) -> None:
    src = open(SRC).read()
    src_lines = src.splitlines()
    tree = ast.parse(src)

    def seg(node) -> str:
        # whole-line slice for top-level units (col 0)
        start = node.lineno
        if getattr(node, "decorator_list", None):
            start = min(d.lineno for d in node.decorator_list)
        return "\n".join(src_lines[start - 1:node.end_lineno])

    def vseg(node) -> str:
        # column-aware slice for expressions embedded mid-line
        return ast.get_source_segment(src, node)

    units, toplevel, imports, special = [], {}, [], {}
    docstring = None
    for node in tree.body:
        if (isinstance(node, ast.Expr)
                and isinstance(node.value, ast.Constant)
                and docstring is None):
            docstring = node
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(node)
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)) and node.name in (
                "build_queries", "build_oracle_sql",
                "_build_oracle_sql_literal"):
            special[node.name] = node
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            name = node.name
        elif isinstance(node, ast.Assign) and isinstance(
                node.targets[0], ast.Name):
            name = node.targets[0].id
        elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name):
            name = node.target.id
        else:
            name = f"__misc_{len(units)}"
        units.append((name, node))
        toplevel[name] = node

    def refs(node) -> set:
        out = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load) \
                    and n.id in toplevel:
                out.add(n.id)
        return out

    unit_refs = {name: refs(node) - {name} for name, node in units}

    # registry extraction
    qmap = {}           # query name -> value source
    for st in ast.walk(special["build_queries"]):
        if isinstance(st, ast.Return):
            for k, v in zip(st.value.keys, st.value.values):
                qmap[ast.literal_eval(k)] = vseg(v).strip().rstrip(",")
    lit_entries = []    # (key, value source)
    for st in ast.walk(special["_build_oracle_sql_literal"]):
        if isinstance(st, ast.Return):
            for k, v in zip(st.value.keys, st.value.values):
                lit_entries.append((ast.literal_eval(k), v))
    prog_entries = []   # (key, expr node)
    prog_imports = []   # ImportFrom stmts inside build_oracle_sql
    for st in special["build_oracle_sql"].body:
        if isinstance(st, ast.ImportFrom):
            prog_imports.append(st)
        elif isinstance(st, ast.Assign) and isinstance(
                st.targets[0], ast.Subscript):
            prog_entries.append(
                (ast.literal_eval(st.targets[0].slice), st.value))

    # query function -> base name of its registry value
    fn_of_query = {}
    for q, vsrc in qmap.items():
        base = vsrc.split(".")[0].split("(")[0].strip()
        fn_of_query[q] = base if base in toplevel else None

    # ---- decide parts: contiguous size-balanced chunks per domain,
    # with query->query references union-found into one part
    qfns_by_domain = defaultdict(list)   # domain -> [fn names in src order]
    fn_domain = {}
    for name, node in units:
        qs = [q for q, f in fn_of_query.items() if f == name]
        if qs:
            d = domain_of(qs[0])
            qfns_by_domain[d].append(name)
            fn_domain[name] = d

    # per-fn estimated weight: unit lines + its oracle entry lines
    key_fn = {q: f for q, f in fn_of_query.items()}
    oracle_w = defaultdict(int)
    for key, v in lit_entries:
        f = key_fn.get(key)
        if f:
            oracle_w[f] += v.end_lineno - v.lineno + 1

    # union-find over query fns (same domain) connected by references
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for name in fn_domain:
        for r in unit_refs[name]:
            if r in fn_domain and fn_domain[r] == fn_domain[name]:
                union(name, r)

    part_of_fn = {}
    part_sizes = defaultdict(int)
    parts_by_domain = defaultdict(list)
    for d in DOMAIN_ORDER:
        fns = qfns_by_domain[d]
        # group by union-find root, keep source order of first member
        groups, seen = [], {}
        for f in fns:
            r = find(f)
            if r in seen:
                groups[seen[r]].append(f)
            else:
                seen[r] = len(groups)
                groups.append([f])
        pi, acc = 0, 0
        for grp in groups:
            w = sum(toplevel[f].end_lineno - toplevel[f].lineno + 1
                    + oracle_w[f] for f in grp)
            if acc and acc + w > PART_BUDGET:
                pi += 1
                acc = 0
            acc += w
            for f in grp:
                part_of_fn[f] = (d, pi)
        n_parts = pi + 1
        parts_by_domain[d] = [f"{d}" if n_parts == 1 else f"{d}_{c}"
                              for c in "abcdefgh"[:n_parts]]

    def part_name(d, pi):
        return parts_by_domain[d][pi]

    # ---- attribute every unit to a part via fixed point
    dom = defaultdict(set)
    for f, (d, pi) in part_of_fn.items():
        dom[f].add(part_name(d, pi))
    # oracle value references seed the key's part
    key_part = {}
    for q in qmap:
        f = key_fn.get(q)
        if f in part_of_fn:
            key_part[q] = part_name(*part_of_fn[f])
        else:
            key_part[q] = parts_by_domain[domain_of(q)][0]
    for key, v in lit_entries + prog_entries:
        for r in refs(v):
            dom[r].add(key_part[key])
    changed = True
    while changed:
        changed = False
        for name, node in units:
            for r in unit_refs[name]:
                if not dom[name] <= dom[r]:
                    dom[r] |= dom[name]
                    changed = True
    module_of = {}
    for name, node in units:
        d = dom[name]
        module_of[name] = next(iter(d)) if len(d) == 1 else "_shared"
    # a query fn must stay in its part (it could have been pulled
    # multi by a cross-part reference — then its HELPERS went shared,
    # but the fn itself stays put and the referrer imports it)
    cross_imports = defaultdict(set)   # module -> names from other modules
    for f, (d, pi) in part_of_fn.items():
        module_of[f] = part_name(d, pi)

    all_modules = ["_shared"] + [p for d in DOMAIN_ORDER
                                 for p in parts_by_domain[d]]

    # cross references: module needs names defined elsewhere
    def needed(module, names):
        for r in names:
            m = module_of.get(r)
            if m and m != module:
                cross_imports[module].add(r)

    for name, node in units:
        needed(module_of[name], unit_refs[name])
    for key, v in lit_entries + prog_entries:
        owner = key_part[key]
        needed(owner, refs(v))

    # prog-import names (jerex_ray.eval etc.) needed by prog exprs
    prog_import_names = set()
    for st in prog_imports:
        for a in st.names:
            prog_import_names.add(a.asname or a.name)

    header_imports = "\n".join(seg(n) for n in imports)

    os.makedirs(outdir, exist_ok=True)
    emitted_registry = defaultdict(list)   # module -> lines

    # registry slices
    q_entries_of = defaultdict(list)
    for q, vsrc in qmap.items():
        f = key_fn.get(q)
        owner = (part_name(*part_of_fn[f]) if f in part_of_fn
                 else parts_by_domain[domain_of(q)][0])
        q_entries_of[owner].append((q, vsrc))
    lit_of = defaultdict(list)
    for key, v in lit_entries:
        lit_of[key_part[key]].append((key, vseg(v)))
    prog_of = defaultdict(list)
    for key, v in prog_entries:
        prog_of[key_part[key]].append((key, vseg(v)))

    uses_R = {m: any(v.startswith("R.") for _, v in q_entries_of[m])
              for m in all_modules}

    sizes = {}
    for module in all_modules:
        out = []
        out.append(f'"""Split of the query registry: ``{module}`` '
                   'part (mechanically derived from the original '
                   'queries.py by scripts/split_queries.py; unit '
                   'order and source text preserved)."""\n')
        out.append(header_imports)
        if uses_R.get(module):
            out.append("from jerex_ray import relational as R")
        # prog imports where needed
        needs_prog = any(r in prog_import_names
                         for _, v in prog_of[module]
                         for r in [w for w in v.replace("(", " ")
                                   .replace(")", " ").split()])
        if needs_prog:
            out.extend(vseg(st) for st in prog_imports)
        if module != "_shared":
            out.append("from jerex_ray.pipelines.queries._shared "
                       "import ORACLE_REGISTRY")
        else:
            out.append("\n# cross-part oracle interpolation registry"
                       "\nORACLE_REGISTRY: dict = {}")
        if cross_imports[module]:
            by_mod = defaultdict(list)
            for r in sorted(cross_imports[module]):
                by_mod[module_of[r]].append(r)
            for m in sorted(by_mod):
                names = ", ".join(sorted(by_mod[m]))
                out.append(
                    f"from jerex_ray.pipelines.queries.{m} "
                    f"import {names}  # noqa: E501")
        out.append("")
        for name, node in units:
            if module_of[name] == module:
                out.append(seg(node))
                out.append("")
        if q_entries_of[module]:
            out.append("QUERIES = {")
            for q, vsrc in q_entries_of[module]:
                out.append(f"    {q!r}: {vsrc},")
            out.append("}")
        else:
            out.append("QUERIES = {}")
        out.append("")
        out.append("ORACLES = {")
        for key, vsrc in lit_of[module]:
            out.append(f"    {key!r}: {vsrc},")
        out.append("}")
        if module != "_shared":
            # a handful of programmatic entries interpolate PREVIOUSLY
            # registered oracle SQL (f-strings over oracles[...]); the
            # shared accumulator preserves that, across parts, in
            # __init__ import order
            out.append("ORACLE_REGISTRY.update(ORACLES)")
            for key, vsrc in prog_of[module]:
                vsrc2 = vsrc.replace("oracles[", "ORACLE_REGISTRY[")
                out.append(f"ORACLES[{key!r}] = "
                           f"ORACLE_REGISTRY[{key!r}] = {vsrc2}")
        text = "\n".join(out) + "\n"
        with open(os.path.join(outdir, module + ".py"), "w") as f:
            f.write(text)
        sizes[module] = text.count("\n")

    # __init__: merge all part namespaces (underscore helpers too —
    # tests import them directly from the package path)
    init = []
    init.append(seg(docstring) if docstring is not None else '""""""')
    init.append("")
    mods = ", ".join(all_modules)
    init.append(f"from . import {mods}  # noqa: E501")
    init.append("""
_PARTS = [%s]

# flat namespace: every public AND underscore name of every part is
# importable from jerex_ray.pipelines.queries, exactly as before the
# split (tests import private helpers by name)
for _m in _PARTS:
    for _n in dir(_m):
        if not _n.startswith("__") and _n not in globals():
            globals()[_n] = getattr(_m, _n)
del _m, _n


def build_queries() -> dict:
    out = {}
    for _p in _PARTS:
        out.update(_p.QUERIES)
    return out


def build_oracle_sql() -> dict:
    out = {}
    for _p in _PARTS:
        out.update(_p.ORACLES)
    return out


# compat: the monolith exposed the literal-dict builder by this name
_build_oracle_sql_literal = build_oracle_sql
""" % mods)
    with open(os.path.join(outdir, "__init__.py"), "w") as f:
        f.write("\n".join(init) + "\n")

    print("module sizes:", sizes)
    print("cross imports:", {k: sorted(v)
                             for k, v in cross_imports.items() if v})


if __name__ == "__main__":
    main(sys.argv[1])

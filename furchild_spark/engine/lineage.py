"""Column-level lineage from ANALYZED plans (dbt docs' column lineage).

Table-level lineage falls out of observed ref()/source() edges
(engine/registry.py); this walks the resolved expression tree Spark
already built to answer the finer question: *which physical source
columns feed this output column?* — e.g. an md5 surrogate key traces
through concat_ws/md5 back to every key part.

Mechanics: every resolved attribute carries a session-unique exprId.
The analyzed plan is one pass:

- every ``Alias`` (Project/Aggregate/Window expression lists) maps its
  exprId → the exprIds it references;
- ``Union`` maps each output attribute positionally onto every child's
  corresponding output (all branches feed the column);
- ``Generate`` (explode/posexplode) maps generator output attributes to
  the generator's references;
- leaf nodes (relations) own the remaining exprIds — the provenance
  endpoints, labeled with the scan's root path when it has one.

A BFS from the requested output column follows alias edges until only
leaf attributes remain. Pure plan introspection: no Spark action, works
on lazy view-mode models, so the CLI can answer lineage questions
without touching the warehouse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class SourceColumn:
    relation: str  # leaf description (scan root path or node string)
    column: str

    def __str__(self) -> str:
        return f"{self.relation}.{self.column}"


def _seq(jseq):
    """Materialize a Scala Seq into a Python list (py4j)."""
    return [jseq.apply(i) for i in range(jseq.size())]


def _walk_expr_aliases(jexpr, defs: dict[int, set[int]]) -> None:
    """Record every Alias in this expression tree: exprId → referenced
    exprIds. Aliases normally sit at the top of a named-expression list,
    but nested ones (struct fields, lambda bodies) cost nothing extra to
    cover."""
    if jexpr.getClass().getSimpleName() == "Alias":
        refs = _seq(jexpr.references().toSeq())
        defs.setdefault(jexpr.exprId().id(), set()).update(
            r.exprId().id() for r in refs
        )
    for child in _seq(jexpr.children()):
        _walk_expr_aliases(child, defs)


def _leaf_label(jnode) -> str:
    """A stable, human-meaningful name for a leaf relation: the scan's
    first root path if it's a file relation, else the node's one-line
    form."""
    try:
        rel = jnode.relation()
        paths = rel.location().rootPaths()
        if paths.size() > 0:
            return paths.apply(0).toString()
    except Exception:
        pass
    try:
        return jnode.simpleString(60)
    except Exception:
        return jnode.getClass().getSimpleName()


def _walk_plan(jplan, defs, leaves) -> None:
    name = jplan.getClass().getSimpleName()
    children = _seq(jplan.children())

    if not children:
        label = _leaf_label(jplan)
        for attr in _seq(jplan.output()):
            leaves.setdefault(attr.exprId().id(), set()).add(
                SourceColumn(label, attr.name())
            )
        return

    if name == "Union":
        # output attrs are positionally the first child's; every branch
        # feeds the column, so fan each output onto ALL children
        out = _seq(jplan.output())
        for child in children:
            child_out = _seq(child.output())
            for o, c in zip(out, child_out):
                defs.setdefault(o.exprId().id(), set()).add(
                    c.exprId().id()
                )
    elif name == "Generate":
        gen_refs = {
            r.exprId().id()
            for r in _seq(jplan.generator().references().toSeq())
        }
        for attr in _seq(jplan.generatorOutput()):
            defs.setdefault(attr.exprId().id(), set()).update(gen_refs)

    for e in _seq(jplan.expressions()):
        _walk_expr_aliases(e, defs)
    for child in children:
        _walk_plan(child, defs, leaves)


def column_lineage(df: DataFrame, column: str) -> set[SourceColumn]:
    """Source columns feeding ``df``'s output column ``column``.

    ``df`` should be a composed (view-mode) plan so parents inline; a
    scan of already-materialized output can only answer "itself".
    """
    jplan = df._jdf.queryExecution().analyzed()
    out = {a.name(): a.exprId().id() for a in _seq(jplan.output())}
    if column not in out:
        raise KeyError(
            f"column {column!r} not in output {sorted(out)}"
        )
    defs: dict[int, set[int]] = {}
    leaves: dict[int, set[SourceColumn]] = {}
    _walk_plan(jplan, defs, leaves)

    sources: set[SourceColumn] = set()
    seen: set[int] = set()
    stack = [out[column]]
    while stack:
        eid = stack.pop()
        if eid in seen:
            continue
        seen.add(eid)
        if eid in leaves:
            sources.update(leaves[eid])
        # an exprId can be BOTH a leaf and aliased elsewhere only if ids
        # collide, which they can't within one session — but a column
        # can pass through defs then terminate at a leaf, so always
        # follow defs too
        stack.extend(defs.get(eid, ()))
    return sources

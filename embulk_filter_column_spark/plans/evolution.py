"""Schema-evolution planner (SURVEY.md §7 step 6).

The reference mutates schemas per-run via its column-rule config
(ColumnFilterPlugin.buildOutputSchema); the CDC engine turns a config
*delta* applied mid-stream into lake DDL: the new output schema plus a
rename map so rows written under the old schema keep their identity.

Rename detection: a rule ``{name: X, src: Y}`` where Y exists in the old
lake schema, X does not, and Y disappears from the new output schema is a
rename Y→X (the engine analog of Iceberg RENAME COLUMN). Everything else
is add (NULL-filled for old files) or drop (projected away).
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..config import FilterConfig


class EvolutionPlan:
    def __init__(self, new_schema: T.StructType, renames: dict,
                 added: list, dropped: list):
        self.new_schema = new_schema
        self.renames = renames
        self.added = added
        self.dropped = dropped

    @property
    def is_noop(self) -> bool:
        return not (self.renames or self.added or self.dropped)

    def __repr__(self) -> str:  # pragma: no cover
        return ("EvolutionPlan(renames=%r added=%r dropped=%r)"
                % (self.renames, self.added, self.dropped))


def plan_evolution(old_schema: T.StructType, new_schema: T.StructType,
                   config: FilterConfig | None = None) -> EvolutionPlan:
    old_names = [f.name for f in old_schema.fields]
    new_names = [f.name for f in new_schema.fields]
    renames: dict = {}
    if config is not None:
        for rule in (*config.columns, *config.add_columns):
            src, name = rule.src, rule.name
            if (src and src in old_names and name not in old_names
                    and src not in new_names and name in new_names):
                renames[src] = name
    renamed_targets = set(renames.values())
    added = [n for n in new_names
             if n not in old_names and n not in renamed_targets]
    dropped = [n for n in old_names
               if n not in new_names and n not in renames]
    return EvolutionPlan(new_schema, renames, added, dropped)

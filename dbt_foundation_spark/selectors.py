"""dbt node-selection syntax — ``--select`` / ``--exclude`` semantics.

The reference's contributing workflow runs selective builds
(``dbt build --select state:modified+``, README.md:280); this module
implements the selector grammar around the manifest so ``project.run``
can take human-shaped selections, not just literal node-name sets:

- ``model``            exact node name
- ``+model``           model plus all transitive ANCESTORS
- ``model+``           model plus all transitive DESCENDANTS
- ``+model+``          both
- ``@model``           model, its descendants, and THEIR ancestors
  (dbt's @: everything needed to rebuild the subtree's consumers)
- ``tag:nightly``      nodes carrying the tag
- ``config.materialized:table``  config-field match
- ``state:modified`` / ``state:modified+``  changed vs a state snapshot
  (delegates to the checksum diff ``Project.modified_plus`` uses)
- space-separated terms UNION (dbt's multiple --select args);
  ``exclude`` terms subtract after the union.

Selection never invents nodes: unknown names raise (a typo'd selector
silently selecting nothing is dbt's most-complained-about footgun).
"""

from __future__ import annotations

from dbt_foundation_spark.manifest import Manifest


def _ancestors(manifest: Manifest, names: set[str]) -> set[str]:
    out = set(names)
    changed = True
    while changed:
        changed = False
        for n in list(out):
            for dep in manifest.nodes[n].depends_on:
                if dep in manifest.nodes and dep not in out:
                    out.add(dep)
                    changed = True
    return out


def _match_term(project, term: str, state: dict | None) -> set[str]:
    manifest = project.manifest
    if term.startswith("tag:"):
        tag = term[4:]
        return {n.name for n in manifest.nodes.values() if tag in n.config.tags}
    if term.startswith("config."):
        field, _, want = term[len("config.") :].partition(":")
        return {
            n.name
            for n in manifest.nodes.values()
            if str(getattr(n.config, field, None)) == want
        }
    if term.startswith("state:modified"):
        if state is None:
            raise ValueError("state:modified needs a state snapshot (state=...)")
        changed = project.modified(state)
        return manifest.downstream(changed) if term.endswith("+") else changed
    plus_pre = term.startswith("+")
    plus_post = term.endswith("+")
    at = term.startswith("@")
    name = term.strip("+").lstrip("@")
    if name not in manifest.nodes:
        raise KeyError(f"selector {term!r}: no node named {name!r}")
    out = {name}
    if at:
        desc = manifest.downstream({name})
        return _ancestors(manifest, desc)
    if plus_post:
        out |= manifest.downstream({name})
    if plus_pre:
        out |= _ancestors(manifest, {name})
    return out


def select_nodes(
    project,
    select: str | list[str],
    exclude: str | list[str] | None = None,
    state: dict | None = None,
) -> set[str]:
    """Resolve selector expressions to a node-name set."""
    terms = select.split() if isinstance(select, str) else list(select)
    chosen: set[str] = set()
    for t in terms:
        chosen |= _match_term(project, t, state)
    if exclude:
        ex_terms = exclude.split() if isinstance(exclude, str) else list(exclude)
        for t in ex_terms:
            chosen -= _match_term(project, t, state)
    return chosen

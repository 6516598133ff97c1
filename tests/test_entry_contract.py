"""Driver-contract invariants for __ray_entry__.py (no heavy execution)."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_queries_and_oracle_keys_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle entries without a query implementation"
    assert len(q) >= 25
    assert len(o) >= 20
    for name, fn in q.items():
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_library_never_inits_ray():
    """Grep-level guard: no ray.init()/ray.shutdown() in the library package
    (sessions belong to bench.py / cli.py / tests / the driver)."""
    import pathlib

    root = pathlib.Path("/root/repo/biosample_enricher_ray")
    offenders = []
    for p in root.rglob("*.py"):
        if p.name == "cli.py":  # CLI owns its session by design
            continue
        src = p.read_text()
        if "ray.init(" in src or "ray.shutdown(" in src:
            offenders.append(str(p))
    assert not offenders, offenders

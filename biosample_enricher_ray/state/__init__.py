"""State: checkpoint store, lineage records, broadcast helpers."""

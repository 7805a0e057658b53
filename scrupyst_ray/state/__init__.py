"""Host-sharded stateful stages: URL-seen set (bloom + exact) and
politeness (robots cache + per-host token budgets)."""

"""Host-side utilities: metrics tables, trajectory evaluation, timing."""

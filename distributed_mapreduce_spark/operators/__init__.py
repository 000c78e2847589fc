"""Relational operator inventory (SURVEY.md §2), as composable
DataFrame → DataFrame functions. Each maps a reference operator to the
declarative Spark form so Catalyst can push filters to the scan, prune
columns, and choose physical join/agg strategies."""

"""Pipeline stages (SURVEY.md §7.1).

Stage order: detect (stateless map_batches over turns) → finalize
(groupby(conv_id).map_groups over candidate facts) → link (actor pool)
→ template (stateless map_batches) → dedup (hash shuffle).
"""

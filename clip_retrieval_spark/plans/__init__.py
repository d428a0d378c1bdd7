"""Pipeline plans (stage DAGs with checkpoint/resume)."""

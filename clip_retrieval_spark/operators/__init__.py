"""Pipeline + library operators (all DataFrame-in, DataFrame-out)."""

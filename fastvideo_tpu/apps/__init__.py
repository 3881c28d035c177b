"""Application tier (reference apps/: studio, dreamverse, dashboards)."""

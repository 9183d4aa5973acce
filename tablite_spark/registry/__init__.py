"""Query/oracle registry wave modules backing ``__spark_entry__.py``."""

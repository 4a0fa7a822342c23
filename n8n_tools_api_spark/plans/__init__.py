from .catalog import ORACLE_QUERIES as _CATALOG_QUERIES
from .pdf_queries import PDF_ORACLE_QUERIES
from .pipeline_queries import PIPELINE_QUERIES

ORACLE_QUERIES = {**_CATALOG_QUERIES, **PDF_ORACLE_QUERIES}


def all_queries():
    """name → callable(spark, sf_dir) for every implemented operator."""
    out = {name: fn for name, (fn, _) in ORACLE_QUERIES.items()}
    out.update(PIPELINE_QUERIES)
    return out


def all_oracles():
    """name → DuckDB SQL for every SQL-expressible query."""
    return {name: sql for name, (_, sql) in ORACLE_QUERIES.items()}


__all__ = ["ORACLE_QUERIES", "PIPELINE_QUERIES", "all_queries", "all_oracles"]

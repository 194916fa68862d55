"""Sources & sinks: PubTator block files, MeSH tree TSV, pages parquet,
GDA / TACRED auxiliary formats (SURVEY.md §2.1 S1-S12)."""

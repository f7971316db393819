from lsh_spark.sources.tables import load_table, load_transcripts, load_dup_labels

__all__ = ["load_table", "load_transcripts", "load_dup_labels"]

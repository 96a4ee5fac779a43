from .parquet import read_sequences, read_documents_as_sequences

__all__ = ["read_sequences", "read_documents_as_sequences"]

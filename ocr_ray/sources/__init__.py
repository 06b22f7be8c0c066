"""Sources: storage-pluggable readers and adapters."""

from .readers import adapt_flat_documents, read_documents  # noqa: F401

from .extract import ExtractStage, extract_dataset, split_heavy_docs, reassemble_parts

__all__ = ["ExtractStage", "extract_dataset", "split_heavy_docs", "reassemble_parts"]

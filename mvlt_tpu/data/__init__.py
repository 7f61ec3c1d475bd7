from mvlt_tpu.data.tokenizer import WordPieceTokenizer

__all__ = ["WordPieceTokenizer"]

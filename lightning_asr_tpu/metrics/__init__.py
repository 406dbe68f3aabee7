from .wer import WER, word_error_rate, editdistance_eval

__all__ = ["WER", "word_error_rate", "editdistance_eval"]

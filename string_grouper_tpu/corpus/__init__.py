from .preprocess import CodepointCorpus, clean_corpus
from .ngrams import NgramWindows, extract_windows, windows_as_sortable_keys
from .tfidf import EllMatrix, TfidfEncoder

__all__ = [
    "CodepointCorpus",
    "clean_corpus",
    "NgramWindows",
    "extract_windows",
    "windows_as_sortable_keys",
    "EllMatrix",
    "TfidfEncoder",
]

from .corpus_build import build_corpus  # noqa: F401

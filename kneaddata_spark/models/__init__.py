from .langid import LangIdModel, train_langid
from .perplexity import PerplexityModel, train_perplexity

__all__ = ["LangIdModel", "train_langid", "PerplexityModel", "train_perplexity"]

from .combinators import pivot_union, horizontal_concat, prefix_columns

__all__ = ["pivot_union", "horizontal_concat", "prefix_columns"]

from .excel import write_excel
from .hyper import write_hyper, HYPER_AVAILABLE
from .parquet import write_parquet

__all__ = ["write_excel", "write_hyper", "write_parquet", "HYPER_AVAILABLE"]

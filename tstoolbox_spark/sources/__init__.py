from .csv import read_timeseries_csv, write_iso_csv  # noqa: F401
from .csv import write_zrxp  # noqa: F401
from .csv import write_pickle  # noqa: F401

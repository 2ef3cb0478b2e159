from tsengine.sources.tables import TABLES, load_table  # noqa: F401
from tsengine.sources.wearable import wearable_long, wearable_wide  # noqa: F401

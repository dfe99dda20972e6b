from .readers import Catalog, load_table, load_tables  # noqa: F401
from .writers import (  # noqa: F401
    insert_if_absent,
    merge_upsert,
    write_partitioned,
    write_overwrite,
)

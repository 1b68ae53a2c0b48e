from aqp_tpu.data.generator import (
    create_relation_pk,
    create_relation_fk,
    create_relation_fk_sel,
    create_relation_zipf,
)

__all__ = [
    "create_relation_pk",
    "create_relation_fk",
    "create_relation_fk_sel",
    "create_relation_zipf",
]

from erigon_extract_spark.plans.extract import (  # noqa: F401
    decode_account_changesets,
    decode_storage_changesets,
    split_plain_state,
    recover_code_hashes,
)
from erigon_extract_spark.plans.transpose import build_state_history  # noqa: F401
from erigon_extract_spark.plans.txbodies import assemble_tx_bodies  # noqa: F401
from erigon_extract_spark.plans.state import (  # noqa: F401
    account_state_at,
    storage_state_at,
)

from .replica import (  # noqa: F401
    make_replica_runner,
    replicate_state,
    sharded_replica_state,
)

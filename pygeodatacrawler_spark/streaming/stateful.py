"""Custom stateful streaming operator: per-host URL dedup + budget.

The streaming twin of the seen-set + token-budget politeness pair
(operators/seen.py, operators/windows.py): a stream of discovered URLs
grouped by registered_domain, with per-group state (seen url hashes +
budget spent) carried across micro-batches via
``applyInPandasWithState``. Emits only first-seen URLs while the host's
budget lasts — the reference's "sidecar exists -> skip" plus harvest
caps (metadata.py:430, utils.py:357), continuous.

State here is an array of hashes (exact, illustrative); at 10^10 scale
the state payload is a bloom bitmap per host — same operator shape,
the state struct swaps ``seen array<long>`` for ``bitmap binary``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "registered_domain string, canon_url string, url_hash long, rank long"
STATE_SCHEMA = "seen array<long>, spent long"


def dedup_with_budget(
    urls_stream: DataFrame,
    budget: int = 100,
    timeout: str = GroupStateTimeout.NoTimeout,
):
    """urls_stream(registered_domain, canon_url, url_hash) ->
    first-seen rows per host while spent < budget, with an emission rank.

    Deterministic within a micro-batch: rows are processed in
    (canon_url) order so replays emit identically.
    """

    def _fn(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen_list, spent = state.get
            seen = set(seen_list)
        else:
            seen, spent = set(), 0
        out_rows = []
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values("canon_url")
        for _, row in pdf.iterrows():
            h = int(row["url_hash"])
            if h in seen or spent >= budget:
                continue
            seen.add(h)
            spent += 1
            out_rows.append(
                {
                    "registered_domain": key[0],
                    "canon_url": row["canon_url"],
                    "url_hash": h,
                    "rank": spent,
                }
            )
        state.update((sorted(seen), spent))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return urls_stream.groupBy("registered_domain").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )

"""Set-oriented DataFrame operators: dedup (exact/window/anti-join/minhash/
simhash-banded), frontier scheduling (rank + politeness budget + salting),
similarity search, and the sharded bloom/cuckoo seen-set filter."""

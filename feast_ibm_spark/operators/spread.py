"""Scale-adaptive row spreading for Arrow-UDF stages.

Every vectorized-UDF operator used to open with an unconditional
``df.repartition(defaultParallelism, id)`` so a single small input file
would not serialize the UDF work onto one core. That constant is wrong
at the TOP end of the scale (guide §2.2/§2.4): a 100 TB corpus's scan
already carries orders of magnitude more partitions than cores, so the
repartition is a gratuitous full shuffle of the payload right before
the UDF — and, worse, it would REDUCE parallelism to the core count.

:func:`spread_for_udf` keeps the all-cores spread for under-split
inputs (the local/small-file case, where it measurably pays) and skips
the shuffle when the scan's own split count (``input bytes /
maxPartitionBytes`` from file metadata — a driver-side listing, no
job) already meets the core count. A finer bytes-per-task target was
measured and REJECTED: per-byte UDF cost varies ~100x between the
numeric vector kernels and the tokenizing text UDFs, so a shared
constant mis-sizes one family or the other (corpus_curation regressed
1.5 s -> 5.5 s under a 4 MB/task target while knn_ivf gained ~0.03 s).
Derived (non-file-backed) frames keep the historical spread — their
partitioning is whatever the upstream shuffle produced, which the
caller cannot inspect cheaply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _dir_file_sizes(sc, directory: str) -> dict[str, int]:
    """{file name: byte length} for one directory — a SINGLE listStatus
    RPC against the filesystem/object store."""
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(directory)
    fs = p.getFileSystem(conf)
    return {
        st.getPath().getName(): st.getLen()
        for st in fs.listStatus(p)
        if st.isFile()
    }


def input_size_bytes(df: DataFrame) -> int | None:
    """Total size of the files backing ``df`` (None when not file-backed).
    Driver-side Hadoop FS metadata only — never touches row data.

    Cost model: ONE ``listStatus`` RPC per distinct PARENT DIRECTORY of
    the input files, not one ``getFileStatus`` per file (the pre-round-5
    shape) — a 100 TB dataset is ~10^6 objects but typically a few
    hundred partition directories, so this is the difference between a
    sub-second listing and 10^6 sequential namenode/S3 round-trips
    before the query even starts."""
    from urllib.parse import unquote

    files = df.inputFiles()
    if not files:
        return None
    by_parent: dict[str, set] = {}
    for f in files:
        parent, _, name = f.rpartition("/")
        # inputFiles() returns URIs (possibly %-encoded); listStatus
        # names come back decoded
        by_parent.setdefault(parent, set()).add(unquote(name))
    sc = df.sparkSession.sparkContext
    total = 0
    for parent, names in by_parent.items():
        sizes = _dir_file_sizes(sc, parent)
        total += sum(sizes.get(n, 0) for n in names)
    return total


def _parse_bytes_conf(s: str) -> int:
    """Parse a Spark size conf string ("134217728b", "128m", plain int)."""
    s = s.strip().lower().removesuffix("b")
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def spread_for_udf(
    df: DataFrame, *key_cols: str, derived: str = "spread"
) -> DataFrame:
    """Spread ``df``'s rows for a following per-row Arrow-UDF stage,
    shuffling only when the shuffle buys parallelism the scan does not
    already have (see module docstring). ``key_cols`` keep the historical
    hash-partitioning key where one was used (any deterministic spread is
    semantically equivalent — the UDFs are per-row).

    ``derived`` picks the policy for non-file-backed frames, whose
    partitioning the helper cannot inspect cheaply: ``"spread"`` (the
    historical all-cores repartition — right for operators that always
    repartitioned) or ``"keep"`` (leave the frame alone — right for call
    sites that never shuffled derived inputs before, where adding a
    corpus-wide shuffle would be a new at-scale cost, e.g. the
    ExactSubstr gram stage over a post-dedup frame)."""
    if derived not in ("spread", "keep"):
        raise ValueError(f"derived must be 'spread' or 'keep', got {derived!r}")
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    size = input_size_bytes(df)
    if size is None and derived == "keep":
        return df
    if size is not None:
        try:
            mpb = _parse_bytes_conf(
                df.sparkSession.conf.get(
                    "spark.sql.files.maxPartitionBytes", str(128 << 20)
                )
            )
        except (ValueError, TypeError):
            mpb = 128 << 20
        if -(-size // mpb) >= par:
            # the scan already fans at least core-count partitions: the
            # repartition would shuffle the payload to buy nothing
            return df
    return df.repartition(par, *key_cols) if key_cols else df.repartition(par)

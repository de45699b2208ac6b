"""Seeded synthetic record generator (SURVEY §2.2 G3-G8; §1.1 schemas).

Reproduces the reference's record shape (DataGenerator.java:455-535):
JSON key {storeId, operatorId, messageId}, nested JSON value
{timestamp, user{name, birthDate, address, favoriteBeers[2]}, payload
= base64(500 deterministic bytes)}, headers X-Country/X-Animal, and
round-robin topic routing.

Spark-first design: every field is a deterministic pure-SQL expression of
the row id — wordlist indexing by modular arithmetic, md5-chain payload
bytes, epoch arithmetic timestamps. Consequences:

- zero Python in the data path (whole-stage codegen end-to-end; the
  reference's javafaker loop is row-at-a-time Java);
- output is a pure function of (seed, row id): independent of partition
  count, task retries, and executor placement — safe at 1000 executors;
- the exact same records can be derived in DuckDB SQL, so even the
  generator is oracle-hash-checked (``gen_sql`` emits both dialects).

Batch mode materializes `spark.range(n)`; streaming mode (streaming_gen)
reuses the same column expressions over a rate source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..naming import all_topic_names

SEED = 42
GEN_EPOCH = "2024-01-01 00:00:00"
PAYLOAD_BYTES = 500

FIRST_NAMES = (
    "Ada Alan Alice Bela Carl Dana Edna Elio Finn Gena Hugo Ines "
    "Ivan Jade Kira Liam Mona Nils Omar Pia Quinn Rosa Sten Tove "
    "Udo Vera Wim Xena Yuri Zita Bodo Cleo"
).split()
LAST_NAMES = (
    "Adler Baker Cohen Dietz Evans Fuchs Gomez Hardy Ibsen Jonas "
    "Kraus Lopez Meyer Novak Olsen Perez Quast Rivas Smith Tamm "
    "Unger Vogel Weiss Xanto Young Zhang Brandt Cruz Duran Ehrlich "
    "Fontes Garza"
).split()
STREETS = (
    "Mill Oak Park Lake Hill Main Birch Cedar Elm Maple River Stone "
    "Sunset Valley Willow Forest"
).split()
CITIES = (
    "Arden Bexley Corby Derry Epsom Frome Goole Hedon Ilkley Jarrow "
    "Kendal Leeds Marlow Neath Otley Poole"
).split()
REGIONS = (
    "North South East West Centro Alta Baja Neu Alt Ost Nord Sud "
    "Upper Lower Mid Outer"
).split()
BEER_NAMES = (
    "Amber Golden Hazy Stout Porter Saison Lager Pilsner Dunkel Wit "
    "Tripel Dubbel Gose Kolsch Marzen Bock"
).split()
BEER_STYLES = "IPA Ale Lager Stout Porter Sour Wheat Pils".split()
COUNTRIES = (
    "Argentina Brazil Canada Denmark Estonia Finland Ghana Hungary "
    "India Japan Kenya Latvia Mexico Norway Oman Peru"
).split()
ANIMALS = (
    "aardvark badger cheetah dingo echidna ferret gecko heron ibex "
    "jackal koala lemur marmot newt ocelot panda"
).split()


def _arr(words: tuple[str, ...] | list[str], dialect: str) -> str:
    items = ", ".join(f"'{w}'" for w in words)
    return f"array({items})" if dialect == "spark" else f"[{items}]"


def _pick(words, prime: int, off: int, dialect: str, id_col: str = "id") -> str:
    """Deterministic wordlist pick: words[(id*prime + off) % len]."""
    idx = f"(({id_col} * {prime} + {off}) % {len(words)})"
    if dialect == "spark":
        return f"element_at({_arr(words, dialect)}, CAST({idx} + 1 AS INT))"
    return f"({_arr(words, dialect)})[CAST({idx} + 1 AS INT)]"


def _digits(fmt: str, parts: list[tuple[int, int, int]], dialect: str, id_col: str = "id") -> str:
    """printf-formatted digit groups from modular arithmetic.

    Linear-congruence digits are periodic (period = modulus) — fine for
    address-style fields, NOT for identifiers; see ``_hash_digits``.
    """
    fn = "format_string" if dialect == "spark" else "printf"
    args = ", ".join(
        f"CAST((({id_col} * {p} + {o}) % {m}) AS BIGINT)" for p, o, m in parts
    )
    return f"{fn}('{fmt}', {args})"


def _hash_digits(
    fmt: str,
    tag: str,
    mods: list[int],
    dialect: str,
    id_col: str = "id",
) -> str:
    """printf digit groups carved from one md5 per (tag, id).

    Full-period entropy (no repeats until the md5 slice space exhausts):
    the reference's faker id numbers are random per record
    (DataGenerator.java:474-480), so key cardinality must scale with row
    count — a 20M-row stress run exposed the lcm=10000 period of the
    linear-congruence version. One md5 per field keeps the cost at 3
    hashes/record for the whole key.
    """
    fn = "format_string" if dialect == "spark" else "printf"
    if dialect == "spark":
        h = f"md5(concat('{tag}:', CAST({id_col} AS STRING)))"
        slices = [
            f"CAST(conv(substr({h}, {1 + 6 * i}, 6), 16, 10) AS BIGINT) % {m}"
            for i, m in enumerate(mods)
        ]
    else:
        h = f"md5(concat('{tag}:', CAST({id_col} AS VARCHAR)))"
        slices = [
            f"(('0x' || substr({h}, {1 + 6 * i}, 6))::BIGINT) % {m}"
            for i, m in enumerate(mods)
        ]
    return f"{fn}('{fmt}', {', '.join(slices)})"


def _payload(dialect: str, seed: int, id_col: str = "id") -> str:
    """base64 of PAYLOAD_BYTES deterministic bytes: sha256 chain over
    (seed, id, i).

    16 sha256 blocks = 512 bytes of entropy, hex-truncated to exactly 500.
    sha256 over md5 is deliberate: hardware SHA extensions make 16 sha256
    calls ~3.5x faster than 32 md5 calls at 1M rows/batch, and DuckDB's
    sha256() emits the identical lowercase hex for the oracle.
    """
    n_blocks = (PAYLOAD_BYTES + 31) // 32
    hexchars = PAYLOAD_BYTES * 2
    if dialect == "spark":
        blocks = (
            f"transform(sequence(0, {n_blocks - 1}), "
            f"i -> sha2(concat('{seed}:', CAST({id_col} AS STRING), ':', CAST(i AS STRING)), 256))"
        )
        # Spark's base64() MIME-chunks long output with \r\n; strip to match
        # the unchunked RFC4648 form DuckDB (and the reference) emit.
        return (
            f"replace(base64(unhex(substr(concat_ws('', {blocks}), 1, {hexchars}))), "
            "'\\r\\n', '')"
        )
    blocks = (
        f"list_transform(generate_series(0, {n_blocks - 1}), "
        f"i -> sha256(concat('{seed}:', CAST({id_col} AS VARCHAR), ':', CAST(i AS VARCHAR))))"
    )
    return f"base64(unhex(substr(array_to_string({blocks}, ''), 1, {hexchars})))"


def _ts_iso(dialect: str, id_col: str = "id") -> str:
    """ISO-8601 instant: GEN_EPOCH + id seconds (batch mode is deterministic;
    streaming mode substitutes the wall clock — DataGenerator.java:483)."""
    if dialect == "spark":
        return (
            f"date_format(timestampadd(SECOND, CAST({id_col} AS INT), "
            f"timestamp'{GEN_EPOCH}'), \"yyyy-MM-dd'T'HH:mm:ss'Z'\")"
        )
    return (
        f"strftime(TIMESTAMP '{GEN_EPOCH}' + {id_col} * INTERVAL '1 second', "
        f"'%Y-%m-%dT%H:%M:%SZ')"
    )


def _birthdate(dialect: str, id_col: str = "id") -> str:
    """Deterministic birthday in [1960-01-01, +18250 days) as ISO instant."""
    days = f"CAST(({id_col} * 17 + 5) % 18250 AS INT)"
    if dialect == "spark":
        return (
            f"concat(CAST(date_add(date'1960-01-01', {days}) AS STRING), 'T00:00:00Z')"
        )
    return f"concat(CAST((DATE '1960-01-01' + {days}) AS VARCHAR), 'T00:00:00Z')"


def _struct(dialect: str, *pairs: tuple[str, str]) -> str:
    if dialect == "spark":
        inner = ", ".join(f"'{k}', {v}" for k, v in pairs)
        return f"named_struct({inner})"
    # keys are double-quoted: some (e.g. "timestamp") are DuckDB keywords
    inner = ", ".join(f'"{k}" := {v}' for k, v in pairs)
    return f"struct_pack({inner})"


def gen_select_exprs(
    dialect: str,
    topics: list[str] | None = None,
    seed: int = SEED,
    id_col: str = "id",
) -> dict[str, str]:
    """Column-name → SQL expression for the generated record, per dialect."""
    topics = topics or all_topic_names(1, 1, 1, 1)
    cast_str = "STRING" if dialect == "spark" else "VARCHAR"

    key = _struct(
        dialect,
        ("storeId", _hash_digits("%03d-%02d-%04d", "store", [1000, 100, 10000], dialect, id_col)),
        ("operatorId", _hash_digits("%03d-%02d-%04d", "op", [1000, 100, 10000], dialect, id_col)),
        ("messageId", _hash_digits("%03d-%02d-%04d", "msg", [1000, 100, 10000], dialect, id_col)),
    )
    address = _struct(
        dialect,
        ("number", f"CAST(({id_col} * 41 + 31) % 9999 + 1 AS {cast_str})"),
        ("street", _pick(STREETS, 43, 37, dialect, id_col)),
        ("city", _pick(CITIES, 47, 41, dialect, id_col)),
        ("region", _pick(REGIONS, 53, 43, dialect, id_col)),
        ("postalCode", _digits("%05d", [(59, 47, 100000)], dialect, id_col)),
    )
    beers_items = ", ".join(
        _struct(
            dialect,
            ("name", _pick(BEER_NAMES, p_n, o_n, dialect, id_col)),
            ("style", _pick(BEER_STYLES, p_s, o_s, dialect, id_col)),
        )
        for (p_n, o_n, p_s, o_s) in [(61, 53, 67, 59), (71, 61, 73, 67)]
    )
    beers = f"array({beers_items})" if dialect == "spark" else f"[{beers_items}]"
    user = _struct(
        dialect,
        ("lastName", _pick(LAST_NAMES, 79, 71, dialect, id_col)),
        ("firstName", _pick(FIRST_NAMES, 83, 73, dialect, id_col)),
        ("birthDate", _birthdate(dialect, id_col)),
        ("address", address),
        ("favoriteBeers", beers),
    )
    value = _struct(
        dialect,
        ("timestamp", _ts_iso(dialect, id_col)),
        ("user", user),
        ("payload", _payload(dialect, seed, id_col)),
    )
    topic = (
        f"element_at({_arr(topics, dialect)}, CAST({id_col} % {len(topics)} + 1 AS INT))"
        if dialect == "spark"
        else f"({_arr(topics, dialect)})[CAST({id_col} % {len(topics)} + 1 AS INT)]"
    )
    return {
        "record_id": id_col,
        "key_json": f"to_json({key})",
        "value_json": f"to_json({value})",
        "topic": topic,
        "h_country": _pick(COUNTRIES, 89, 79, dialect, id_col),
        "h_animal": _pick(ANIMALS, 97, 83, dialect, id_col),
    }


def gen_sql(dialect: str, n: int, topics: list[str] | None = None, seed: int = SEED) -> str:
    """Full generator query in the given dialect over range(n)."""
    exprs = gen_select_exprs(dialect, topics, seed)
    cols = ", ".join(f"{e} AS {name}" for name, e in exprs.items())
    src = f"range({n})" if dialect == "spark" else f"range({n}) t(id)"
    return f"SELECT {cols} FROM {src} ORDER BY record_id"


def generate_batch(
    spark: SparkSession,
    n: int,
    topics: list[str] | None = None,
    seed: int = SEED,
) -> DataFrame:
    """Batch-materialize n generated records (oracle-testable mode)."""
    return spark.sql(gen_sql("spark", n, topics, seed))


def to_kafka_rows(records: DataFrame) -> DataFrame:
    """Project generator output to the Spark Kafka-sink shape:
    key/value binary, headers array<struct<key,value binary>>, topic."""
    from pyspark.sql import functions as F

    return records.select(
        F.col("key_json").cast("binary").alias("key"),
        F.col("value_json").cast("binary").alias("value"),
        F.array(
            F.struct(
                F.lit("X-Country").alias("key"),
                F.col("h_country").cast("binary").alias("value"),
            ),
            F.struct(
                F.lit("X-Animal").alias("key"),
                F.col("h_animal").cast("binary").alias("value"),
            ),
        ).alias("headers"),
        F.col("topic"),
    )

"""URL curation: DuckDB replays the identical Java∩RE2 patterns over a
planted fixture of tricky URLs and over a corpus-synthesized url
column; plus direct behavioral assertions for canonicalization,
blocklist filtering, and per-domain caps."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.urls import (
    MULTI_SUFFIXES,
    TRACKING_PARAM_RE,
    blocklist_filter,
    canonical_url,
    domain_caps,
    parse_urls,
    url_dedup,
)
from distributed_mapreduce__spark.sources.tables import load_table

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

SF = "/root/testdata/sf0.01"

PLANTED = [
    (1, "HTTPS://WWW.Example.COM:443/Path/Page?id=7&utm_source=news#frag"),
    (2, "http://example.com:80/"),
    (3, "http://example.com"),
    (4, "https://blog.sub.example.co.uk/post?utm_a=1&utm_b=2"),
    (5, "https://example.com/search?href=keep&ref=drop&q=x"),
    (6, "ftp://Files.Example.ORG:2121/pub/file.txt"),
    (7, "not a url at all"),
    (8, "https://localhost/admin"),
    (9, "https://example.com/a?fbclid=abc"),
    (10, "https://example.com/a?gclid=1&msclkid=2&id=3"),
    (11, ""),
    (12, "https://shop.example.com.au/item/9?ref=partner#top"),
    (13, "https://example.com/a&ref=b"),
]


def _canon_sql(col: str) -> str:
    """DuckDB replay of canonical_url — same patterns, RE2 group refs."""
    c = f"regexp_replace({col}, '#.*$', '', 'g')"
    head = f"regexp_replace({c}, '\\?.*$', '', 'g')"
    q = f"regexp_extract({c}, '\\?(.*)$', 1)"
    q = f"regexp_replace({q}, '{TRACKING_PARAM_RE}', '\\1', 'g')"
    q = f"regexp_replace({q}, '^&+', '', 'g')"
    q = f"regexp_replace({q}, '&&+', '&', 'g')"
    q = f"regexp_replace({q}, '&+$', '', 'g')"
    c = f"CASE WHEN {q} = '' THEN {head} ELSE {head} || '?' || {q} END"
    scheme = f"lower(regexp_extract({c}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"regexp_extract({c}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    tail = f"regexp_replace({c}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g')"
    c = (
        f"CASE WHEN {scheme} = '' THEN {c} "
        f"ELSE {scheme} || '://' || lower({auth}) || {tail} END"
    )
    c = f"regexp_replace({c}, '^(http://[^/:?#]+):80(/|$|\\?)', '\\1\\2', 'g')"
    c = f"regexp_replace({c}, '^(https://[^/:?#]+):443(/|$|\\?)', '\\1\\2', 'g')"
    c = f"regexp_replace({c}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)/$', '\\1', 'g')"
    return c


def _domain_sql(host: str) -> str:
    """DuckDB replay of registered_domain over a lower-cased host."""
    parts = f"string_split({host}, '.')"
    last2 = f"({parts})[-2] || '.' || ({parts})[-1]"
    last3 = f"({parts})[-3] || '.' || {last2}"
    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return (
        f"CASE WHEN len({parts}) <= 2 THEN {host} "
        f"WHEN len({parts}) >= 3 AND ({last2}) IN ({suffixes}) THEN {last3} "
        f"ELSE {last2} END"
    )


def _parse_sql(table: str) -> str:
    host = "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))"
    return f"""
        SELECT doc_id, url,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               {host} AS host,
               {_domain_sql(host)} AS domain,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query,
               {_canon_sql('url')} AS canonical
        FROM {table}
    """


def _duck_with_planted():
    con = duckdb.connect()
    con.execute("CREATE TABLE planted (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", PLANTED)
    return con


def test_parse_urls_matches_oracle_on_planted(spark):
    df = spark.createDataFrame(PLANTED, "doc_id long, url string")
    got = sorted(map(tuple, parse_urls(df).collect()))
    want = sorted(_duck_with_planted().execute(_parse_sql("planted")).fetchall())
    assert got == want


def test_parse_urls_matches_oracle_on_corpus(spark):
    """Corpus-scale parity: a deterministic url synthesized from the
    documents table the same way in both engines."""
    url_expr = (
        "'https://www.' || source || '.example.com/docs/' || doc_id "
        "|| '?utm_campaign=x&id=' || doc_id || '#s'"
    )
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.expr(url_expr).alias("url")
    )
    got = sorted(map(tuple, parse_urls(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs_urls AS SELECT doc_id, {url_expr} AS url "
        f"FROM '{SF}/documents.parquet'"
    )
    want = sorted(con.execute(_parse_sql("docs_urls")).fetchall())
    assert got == want


def test_canonicalization_behavior(spark):
    df = spark.createDataFrame(PLANTED, "doc_id long, url string")
    canon = {
        r.doc_id: r.c
        for r in df.select("doc_id", canonical_url(F.col("url")).alias("c")).collect()
    }
    # scheme+host lowered, :443 dropped, utm + fragment stripped,
    # path case preserved
    assert canon[1] == "https://www.example.com/Path/Page?id=7"
    # :80 dropped and bare trailing slash dropped → equal to the
    # no-slash spelling
    assert canon[2] == canon[3] == "http://example.com"
    # consecutive tracking params collapse cleanly
    assert canon[4] == "https://blog.sub.example.co.uk/post"
    # 'ref' strips only as a whole param name — href= survives
    assert canon[5] == "https://example.com/search?href=keep&q=x"
    # non-http(s) ports are preserved
    assert canon[6] == "ftp://files.example.org:2121/pub/file.txt"
    # non-URLs and empty strings pass through untouched
    assert canon[7] == PLANTED[6][1]
    assert canon[11] == ""
    assert canon[9] == "https://example.com/a"
    assert canon[10] == "https://example.com/a?id=3"
    # '&' inside a query-less PATH is not a param separator — untouched
    assert canon[13] == "https://example.com/a&ref=b"


def test_registered_domain_psl_fixes_heuristic_and_agrees_on_overlap(spark):
    """PSL longest-match vs the heuristic: (a) parity on every host the
    heuristic handles (plain + its 17 multi-label suffixes), (b) the
    cases the heuristic gets WRONG — private-section suffixes like
    github.io — fixed, (c) publicsuffix.org edge semantics: a host that
    IS a suffix passes through; unknown TLDs take the default rule."""
    from distributed_mapreduce__spark.operators.urls import (
        registered_domain,
        registered_domain_psl,
    )

    hosts = [
        # heuristic-overlap set: both must agree
        ("www.example.com", None),
        ("example.com", None),
        ("blog.sub.example.co.uk", None),
        ("shop.example.com.au", None),
        ("a.b.c.example.co.jp", None),
        ("localhost", None),
        # heuristic-wrong set: PSL answer differs and is correct
        ("alice.github.io", "alice.github.io"),       # heuristic: github.io
        ("deep.alice.github.io", "alice.github.io"),
        ("myapp.herokuapp.com", "myapp.herokuapp.com"),
        ("b.s3.amazonaws.com", "b.s3.amazonaws.com"),  # 3-label rule wins
        # a host that IS a public suffix has no eTLD+1 → unchanged
        ("github.io", "github.io"),
        # unknown TLD → default '*' rule → last two labels
        ("x.y.zz-unknown", "y.zz-unknown"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {
        r.host: (r.heur, r.psl)
        for r in df.select(
            "host",
            registered_domain(F.lower(F.col("host"))).alias("heur"),
            registered_domain_psl(F.lower(F.col("host"))).alias("psl"),
        ).collect()
    }
    for h, expect_psl in hosts:
        heur, psl = got[h]
        if expect_psl is None:
            assert psl == heur, (h, heur, psl)
        else:
            assert psl == expect_psl, (h, psl)
    # the flagship wrong case really is wrong under the heuristic
    assert got["alice.github.io"][0] == "github.io"


def test_registered_domain_psl_accepts_custom_list_and_dataframe(spark):
    from distributed_mapreduce__spark.operators.urls import registered_domain_psl

    df = spark.createDataFrame([("a.b.custom.tld",)], "host string")
    for psl in (["custom.tld"], spark.createDataFrame([("custom.tld",)], "s string")):
        got = df.select(registered_domain_psl(F.col("host"), psl).alias("d")).first().d
        assert got == "b.custom.tld"


def test_parse_urls_psl_mode(spark):
    urls = [(1, "https://alice.github.io/p?x=1")]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    assert parse_urls(df).first().domain == "github.io"  # heuristic default
    assert parse_urls(df, psl="snapshot").first().domain == "alice.github.io"


def test_url_dedup_keeps_one_per_canonical(spark):
    dupes = [
        (1, "https://example.com/a?utm_source=x"),
        (2, "https://EXAMPLE.com/a"),
        (3, "https://example.com/a#frag"),
        (4, "https://example.com/b"),
    ]
    df = spark.createDataFrame(dupes, "doc_id long, url string")
    kept = sorted(r.doc_id for r in url_dedup(df).collect())
    assert kept == [1, 4]  # min doc_id per canonical survives


def test_blocklist_filter_drops_subdomains_too(spark):
    df = spark.createDataFrame(PLANTED, "doc_id long, url string")
    kept = {r.doc_id for r in blocklist_filter(df, ["example.com"]).collect()}
    # every *.example.com URL is gone; co.uk / com.au / org / localhost
    # / non-URLs survive
    assert kept == {4, 6, 7, 8, 11, 12}


def test_domain_caps_bounds_and_determinism(spark):
    rows = [(i, f"https://www.site{i % 3}.com/p/{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = domain_caps(df, cap=5)
    counts = (
        capped.select(F.regexp_extract("url", r"(site\d)", 1).alias("d"))
        .groupBy("d")
        .count()
        .collect()
    )
    assert {r.d for r in counts} == {"site0", "site1", "site2"}
    assert all(r["count"] == 5 for r in counts)
    again = sorted(r.doc_id for r in domain_caps(df, cap=5).collect())
    assert again == sorted(r.doc_id for r in capped.collect())


def test_canonical_url_idempotent_property(spark):
    """canonical() is idempotent — a dedup-key contract: re-canonizing
    stored canonical URLs must be a no-op, or keys drift between
    pipeline stages. One Spark job over hypothesis-style adversarial
    URL fragments (generated eagerly: per-example Spark jobs are too
    slow for @given)."""
    import itertools

    schemes = ["https://", "HTTP://", "ftp://", ""]
    hosts = ["A.B", "x.co.uk", "a", ""]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["", "/", "/p", "/p&ref=b", "//"]
    queries = ["", "?", "?utm_a=1", "?x=1&utm_b=2&y=3", "?ref=x&href=keep",
               "?&&", "?utm_a=1&utm_b=2"]
    frags = ["", "#f", "#f#g"]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, hosts, ports, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    bad = (
        df.select("u", canonical_url(F.col("u")).alias("c1"))
        .select("u", "c1", canonical_url(F.col("c1")).alias("c2"))
        .filter(F.col("c1") != F.col("c2"))
        .collect()
    )
    assert not bad, bad[:5]


def test_registered_domain_psl_wildcard_and_exception_rules(spark):
    """Full publicsuffix.org rule semantics: '*.ck' makes any single
    label under ck a suffix; '!www.ck' carves www.ck back out as
    registrable; deeper wildcards ('*.kawasaki.jp' + exception) behave
    identically one level down."""
    from distributed_mapreduce__spark.operators.urls import registered_domain_psl

    cases = [
        ("foo.bar.ck", "foo.bar.ck"),        # bar.ck is a (wildcard) suffix
        ("a.foo.bar.ck", "foo.bar.ck"),      # eTLD+1 under wildcard
        ("bar.ck", "bar.ck"),                # IS a suffix → pass-through
        ("www.ck", "www.ck"),                # exception: registrable itself
        ("foo.www.ck", "www.ck"),            # exception rule prevails
        ("x.y.kawasaki.jp", "x.y.kawasaki.jp"),      # wildcard depth 3
        ("a.x.y.kawasaki.jp", "x.y.kawasaki.jp"),
        ("city.kawasaki.jp", "city.kawasaki.jp"),    # exception depth 3
        ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
        ("a.b.bd", "a.b.bd"),                # *.bd
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl(F.col("host")).alias("d")
        ).collect()
    }
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_registered_domain_psl_deep_suffix_hosts_pass_through(spark):
    """A host that IS a 3+-label (wildcard) public suffix must pass
    through unchanged — the n==depth case the default rule would
    otherwise truncate (review r5 finding)."""
    from distributed_mapreduce__spark.operators.urls import registered_domain_psl

    cases = [
        ("y.kawasaki.jp", "y.kawasaki.jp"),   # wildcard suffix itself
        ("s3.amazonaws.com", "s3.amazonaws.com"),  # 3-label exact suffix
        ("co.uk", "co.uk"),                    # 2-label exact suffix
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl(F.col("host")).alias("d")
        ).collect()
    }
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_registered_domain_psl_is_pure_projection(spark):
    """The InSet compilation claim, pinned on the physical plan: PSL
    domain extraction adds ZERO exchanges/joins — it rides the
    projection."""
    from distributed_mapreduce__spark.operators.urls import registered_domain_psl

    df = spark.createDataFrame([("a.b.co.uk",), ("x.github.io",)], "host string")
    plan = (
        df.select(registered_domain_psl(F.col("host")).alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_load_psl_dat_parses_real_format(spark):
    """The full publicsuffix.org dat file is a file read away: the
    parser honors comments, section markers, wildcard/exception rules,
    and inline trailing text — and its output drives
    registered_domain_psl identically to a hand-built rule list."""
    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.operators.urls import (
        load_psl_dat,
        registered_domain_psl,
    )

    dat = """
// This is a comment
// ===BEGIN ICANN DOMAINS===
uk
co.uk
// ck : https://en.wikipedia.org/wiki/.ck
*.ck
!www.ck
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
// ===END PRIVATE DOMAINS===
orphan.example
"""
    rules = load_psl_dat(dat)
    assert rules == ["uk", "co.uk", "*.ck", "!www.ck", "github.io",
                     "orphan.example"]
    # section filter drops private rules; unmarked rules always survive
    assert "github.io" not in load_psl_dat(dat, sections=("icann",))
    assert "orphan.example" in load_psl_dat(dat, sections=("icann",))

    cases = [
        ("a.b.co.uk", "b.co.uk"),       # exact multi-label rule
        ("x.foo.ck", "x.foo.ck"),       # wildcard: foo.ck IS the suffix
        ("a.x.foo.ck", "x.foo.ck"),     # eTLD+1 under the wildcard
        ("a.www.ck", "www.ck"),         # exception carve-out
        ("docs.github.io", "docs.github.io"),  # private-section rule
        ("some.random.site", "random.site"),   # default * rule
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl(F.col("host"), rules).alias("d")
        ).collect()
    }
    assert got == dict(cases)


def test_psl_snapshot_has_no_coarser_than_psl_entries(spark):
    """ADVICE r5: bare amazonaws.com/windows.net/fastly.net are NOT
    verbatim PSL rules (the real list only carries deeper entries for
    those providers) — the snapshot must not reintroduce them.

    Contract being pinned: PSL longest-match semantics GIVEN the
    snapshot's rule subset. For hosts whose real-list rule is absent
    from the snapshot (the full dump carries e.g.
    *.compute.amazonaws.com, blob.core.windows.net, global.ssl.
    fastly.net in its private section), the default * rule applies and
    grouping lands at the provider apex — COARSER than a full dump
    would produce. That is the documented behavior of a subset
    snapshot, not real-dump parity; load the full dat via load_psl_dat
    for dump-faithful grouping (wildcard/exception handling is
    covered by its own tests)."""
    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.operators.urls import (
        PSL_SNAPSHOT,
        registered_domain_psl,
    )

    assert "amazonaws.com" not in PSL_SNAPSHOT
    assert "windows.net" not in PSL_SNAPSHOT
    assert "fastly.net" not in PSL_SNAPSHOT
    assert "s3.amazonaws.com" in PSL_SNAPSHOT  # the verbatim deeper rule

    cases = [
        # no SNAPSHOT rule matches these hosts → default * rule,
        # provider-apex grouping (a full dump's deeper rules would
        # group these differently — see docstring)
        ("x.ec2.amazonaws.com", "amazonaws.com"),
        ("myapp.blob.core.windows.net", "windows.net"),
        ("global.ssl.fastly.net", "fastly.net"),
        # the verbatim s3 rule still wins where it applies
        ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl(F.col("host")).alias("d")
        ).collect()
    }
    assert got == dict(cases)


def test_full_psl_vendored_list_covers_snapshot_gaps(spark):
    """The vendored full publicsuffix.org dump (~9.5k rules) must
    drive the same InSet compile path as the snapshot, and must get
    right the rule families the embedded snapshot deliberately lacks:
    deep exact rules (pvt.k12.ma.us), wildcards (*.sapporo.jp,
    *.nom.br) and their exceptions (!city.sapporo.jp)."""
    from distributed_mapreduce__spark.operators.urls import (
        full_psl,
        registered_domain_psl,
    )

    rules = full_psl()
    assert len(rules) > 9000
    assert full_psl() is rules  # memoized

    cases = {
        # deep exact rule, absent from the snapshot
        "myschool.pvt.k12.ma.us": "myschool.pvt.k12.ma.us",
        "www.myschool.pvt.k12.ma.us": "myschool.pvt.k12.ma.us",
        # wildcard absent from the snapshot: suffix = <label>.sapporo.jp
        "blog.x.sapporo.jp": "blog.x.sapporo.jp",
        "a.blog.x.sapporo.jp": "blog.x.sapporo.jp",
        # exception overriding that wildcard
        "city.sapporo.jp": "city.sapporo.jp",
        "www.city.sapporo.jp": "city.sapporo.jp",
        # wildcard under a multi-label tail
        "a.b.nom.br": "a.b.nom.br",
        "x.a.b.nom.br": "a.b.nom.br",
        # sanity: common rules behave identically to the snapshot
        "www.example.co.uk": "example.co.uk",
        "user.github.io": "user.github.io",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain_psl(F.col("host"), psl=rules).alias("d")
        ).collect()
    }
    assert got == cases

    # every ICANN-section rule in the snapshot exists verbatim in the
    # full dump (the private section genuinely drifts: upstream has
    # REMOVED entries the snapshot still carries, e.g. tumblr.com and
    # wordpress.com left the list — so no subset claim there)
    icann_rules = set(full_psl(sections=("icann",)))
    for s in ("co.uk", "com.ar", "ac.jp", "gov.in", "*.ck", "!www.ck", "*.bd"):
        assert s in icann_rules, s

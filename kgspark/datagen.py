"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1/F5).

Generates the BASELINE.json ``input_hint`` table
``(url, warc_ts, html, text, lang)`` plus its ground truth:

- fact rows (the healthcare-style tuples each page's sentences encode,
  in page/sentence order) — golden input for triple P/R;
- an alias dictionary (alias → canonical provider name) — ground truth
  for entity linking.

Design (all seeded; zero wall-clock / global randomness):
- hosts are Zipf-skewed over ~50 hosts (url-host salting fixture);
- a few head providers appear on a large fraction of pages (hub-node
  skew mirroring the reference's own data, healthcare_data.ttl:45-64);
- a slice of mentions use alias or typo forms (linking exercise);
- ``text`` is pre-extracted for half the rows and None for the rest
  (pipeline must fall back to extracting from ``html``);
- ~10% of pages are non-English (language-filter exercise).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

FIRST_NAMES = [
    "John", "Jessica", "Michael", "Emily", "Sarah", "David", "Laura", "James",
    "Anna", "Robert", "Maria", "Peter", "Linda", "Thomas", "Karen", "Paul",
]
LAST_NAMES = [
    "Smith", "Lee", "Brown", "Davis", "Johnson", "Wilson", "Clark", "Young",
    "Hall", "King", "Wright", "Scott", "Green", "Baker", "Adams", "Nelson",
]
PATIENT_FIRST = [
    "Alice", "Bob", "Charlie", "Eva", "Frank", "Grace", "Henry", "Ivy",
    "Jack", "Kate", "Liam", "Mona", "Noah", "Olga", "Pete", "Quinn",
]
PATIENT_LAST = [
    "White", "Black", "Blue", "Red", "Yellow", "Gray", "Stone", "Field",
    "Brook", "Hill", "Lake", "Wood", "Marsh", "Vale", "Glen", "Shore",
]
SPECIALIZATIONS = [
    "Pediatrics", "Cardiology", "Neurology", "Dermatology", "Orthopedics",
    "Oncology", "Radiology", "Psychiatry",
]
LOCATIONS = [
    "Los Angeles", "New York", "Chicago", "Houston", "Phoenix",
    "Boston", "Seattle", "Denver", "Miami", "Atlanta",
]
CONDITIONS = [
    "Asthma", "Diabetes", "Hypertension", "Eczema", "Epilepsy",
    "Osteoarthritis", "Migraine", "Anemia",
]
BIO_TOPICS = [
    "preventive care", "clinical research", "patient outcomes",
    "minimally invasive procedures", "chronic disease management",
]

FACT_SENTENCE = (
    "{prov}, a {specs} specialist based in {locs}, treats "
    "{pat} (age {age}, {gender}, {conds})."
)
BIO_SENTENCE = "{prov} is a physician focused on {topic}."

NON_EN_FILLER = {
    "de": "Dies ist eine Beispielseite ohne medizinische Fakten.",
    "es": "Esta es una página de ejemplo sin datos médicos.",
}


@dataclass
class Corpus:
    pages: list[tuple]  # (url, warc_ts, html, text, lang)
    fact_rows: list[dict]  # golden fact rows in page/sentence order
    aliases: list[tuple[str, str]]  # (alias, canonical)
    providers: list[str] = field(default_factory=list)
    page_texts: dict[str, str] = field(default_factory=dict)  # url -> golden text


def _mk_html(title: str, body_sentences: list[str], rng: random.Random) -> str:
    paras = "\n".join(f"    <p>{s}</p>" for s in body_sentences)
    return f"""<!DOCTYPE html>
<html>
<head>
  <title>{title}</title>
  <script>var tracker = "{rng.randrange(10**9)}"; load();</script>
  <style>body {{ margin: 0; }}</style>
</head>
<body>
  <nav><a href="/">home</a> | <a href="/about">about</a></nav>
  <header><h1>{title}</h1></header>
  <div id="main">
{paras}
  </div>
  <footer>© example.org — all rights reserved. <a href="/tos">terms</a></footer>
</body>
</html>"""


def _multi(rng: random.Random, pool: list[str], p_multi: float) -> list[str]:
    if rng.random() < p_multi:
        return rng.sample(pool, 2)
    return [rng.sample(pool, 1)[0]]


def generate_corpus(
    n_pages: int = 1000,
    seed: int = 42,
    n_providers: int = 40,
    n_head: int = 3,
    alias_fraction: float = 0.15,
    non_en_fraction: float = 0.1,
    pre_extracted_fraction: float = 0.5,
    facts_range: tuple[int, int] = (1, 3),
    filler_paras: int = 0,
) -> Corpus:
    rng = random.Random(seed)

    # fail fast instead of spinning forever when the requested count
    # exceeds the finite first×last name pools
    pool_p = len(FIRST_NAMES) * len(LAST_NAMES)
    pool_t = len(PATIENT_FIRST) * len(PATIENT_LAST)
    if n_providers > pool_p or n_providers * 3 > pool_t:
        raise ValueError(
            f"n_providers={n_providers} needs {n_providers} provider and "
            f"{n_providers * 3} patient names but the pools hold only "
            f"{pool_p} and {pool_t} unique combinations"
        )
    providers = []
    seen = set()
    while len(providers) < n_providers:
        name = f"Dr. {rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        if name not in seen:
            seen.add(name)
            providers.append(name)
    patients = []
    seen = set()
    while len(patients) < n_providers * 3:
        name = f"{rng.choice(PATIENT_FIRST)} {rng.choice(PATIENT_LAST)}"
        if name not in seen:
            seen.add(name)
            patients.append(name)

    # alias dictionary: "Dr. Smith" → "Dr. John Smith" (first match wins the
    # short form; later same-surname providers get initial-form aliases)
    aliases: list[tuple[str, str]] = []
    taken: set[str] = set()
    for p in providers:
        first, last = p.split(" ")[1], p.split(" ")[2]
        for form in (f"Dr. {last}", f"Dr. {first[0]}. {last}"):
            # an ambiguous alias (two providers sharing it) must not exist:
            # real alias dictionaries are keyed uniquely
            if form not in taken:
                aliases.append((form, p))
                taken.add(form)

    alias_map = dict(aliases)
    hosts = [f"site{h}.example.org" for h in range(50)]
    # Zipf-ish host weights
    host_weights = [1.0 / (i + 1) for i in range(len(hosts))]

    pages: list[tuple] = []
    fact_rows: list[dict] = []
    page_texts: dict[str, str] = {}
    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)

    for i in range(n_pages):
        host = rng.choices(hosts, weights=host_weights)[0]
        url = f"https://{host}/page/{i}"
        warc_ts = epoch + timedelta(seconds=i * 37)
        lang = "en"
        if rng.random() < non_en_fraction:
            lang = rng.choice(list(NON_EN_FILLER))

        sentences: list[str] = []
        if lang != "en":
            sentences.append(NON_EN_FILLER[lang])
        else:
            for _ in range(rng.randint(*facts_range)):
                # head providers dominate (hub-entity skew)
                if rng.random() < 0.5:
                    prov = providers[rng.randrange(n_head)]
                else:
                    prov = rng.choice(providers)
                mention = prov
                if rng.random() < alias_fraction:
                    # use an alias form of this provider if one exists
                    forms = [a for a, c in aliases if c == prov]
                    if forms:
                        mention = rng.choice(forms)
                specs = _multi(rng, SPECIALIZATIONS, 0.2)
                locs = _multi(rng, LOCATIONS, 0.2)
                conds = _multi(rng, CONDITIONS, 0.15)
                pat = rng.choice(patients)
                age = rng.randint(18, 95)
                gender = rng.choice(["Male", "Female"])
                sentences.append(
                    FACT_SENTENCE.format(
                        prov=mention,
                        specs=" and ".join(specs),
                        locs=" and ".join(locs),
                        pat=pat,
                        age=age,
                        gender=gender,
                        conds=" and ".join(conds),
                    )
                )
                has_bio = rng.random() < 0.3
                topic = rng.choice(BIO_TOPICS)
                if has_bio:
                    sentences.append(BIO_SENTENCE.format(prov=mention, topic=topic))
                fact_rows.append(
                    {
                        "Provider": alias_map.get(mention, mention),
                        "Patient": pat,
                        "Specialization": "|".join(specs),
                        "Location": "|".join(locs),
                        "Bio": BIO_SENTENCE.format(prov=mention, topic=topic) if has_bio else "",
                        "Patient_Age": str(age),
                        "Patient_Gender": gender,
                        "Patient_Condition": "|".join(conds),
                    }
                )

        for _ in range(filler_paras):  # non-fact prose (extractor noise)
            words = [rng.choice(BIO_TOPICS).split()[0] for _ in range(20)]
            sentences.append("Background reading on " + " ".join(words) + ".")

        html = _mk_html(f"Provider directory {i}", sentences, rng)
        # golden text is defined by the shared extractor; filled in lazily to
        # avoid a circular import
        from kgspark.extract.html import extract_text

        text = extract_text(html.encode("utf-8"))
        page_texts[url] = text
        pre = text if rng.random() < pre_extracted_fraction else None
        pages.append((url, warc_ts, html.encode("utf-8"), pre, lang))

    return Corpus(
        pages=pages,
        fact_rows=fact_rows,
        aliases=aliases,
        providers=providers,
        page_texts=page_texts,
    )


WEBPAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
ALIAS_SCHEMA = "alias string, canonical string"


def corpus_to_spark(spark, corpus: Corpus):
    """(webpages_df, aliases_df, canonicals_df) from a generated corpus."""
    pages = spark.createDataFrame(corpus.pages, schema=WEBPAGE_SCHEMA)
    aliases = spark.createDataFrame(corpus.aliases, schema=ALIAS_SCHEMA)
    canonicals = spark.createDataFrame(
        [(p,) for p in corpus.providers], schema="canonical string"
    )
    return pages, aliases, canonicals


def write_corpus(spark, corpus: Corpus, out_dir: str) -> None:
    """Write the corpus in the layout ``tools/submit_job.py pipeline
    --src`` reads back ({src}/webpages, {src}/aliases,
    {src}/canonicals) — the directory names, not '.parquet'-suffixed
    ones, so the documented spark-submit flow works end-to-end."""
    pages, aliases, canonicals = corpus_to_spark(spark, corpus)
    pages.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/webpages")
    aliases.write.mode("overwrite").parquet(f"{out_dir}/aliases")
    canonicals.write.mode("overwrite").parquet(f"{out_dir}/canonicals")

"""Deterministic synthesis of the tweets star schema (FIXTURES.md §1).

Small in-memory tables for the golden-document and denormalization tests
(SURVEY §5.2 item 2). The generated data embeds every edge case the
reference's semantics hinge on:

(a) conversation 1: every child type populated — the golden document,
    mirroring /root/reference/docs/sample_document.json:5-94 structurally
    (duplicate context-annotation pair included, sample_document.json:26-51);
(b) conversation 2: no children at all → every top-level array is []
    (COALESCE, queries.sql:21-25);
(c) conversation 3 references parent 2, which has no hashtags → the nested
    conversation_references[*].hashtags stays NULL (queries.sql:61-66 has no
    COALESCE);
(d) authors straddling the >100 follower/following thresholds
    (elastic_queries.json:24-29);
(e) text content with HTML fragments, diacritics, possessives, mixed-case
    hashtags — analyzer fodder (settings.json analyzers).
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from tweets_elastic_spark import schemas


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def make_tweets_tables(
    spark: SparkSession, n_conversations: int = 100, seed: int = 42
) -> dict[str, DataFrame]:
    rng = random.Random(seed)
    langs = ["en", "sk", "de", "es"]
    sources = ["Twitter for Android", "Twitter Web App", "Twitter for iPhone"]

    authors = [
        # id, name, username, description, followers, following, tweets, listed
        (1, "Wilbur Soot", "WilburSoot", "I'm in Antarctica's coldest café", 500000, 50, 1200, 300),
        (2, "Zoë Müller", "zoe_m", "Grüße aus München <b>bold</b>", 150, 120, 40, 2),
        # (d) straddling the >100 thresholds
        (3, "Low Follow", "lowfollow", "exactly at boundary", 100, 100, 10, 0),
        (4, "Just Above", "justabove", "barely over", 101, 101, 11, 0),
        (5, "Renée O'Brien", "renee", None, 99, 3000, 5, 1),
    ] + [
        (
            i,
            f"Author {i} Æøå",
            f"user{i}",
            (None if rng.random() < 0.1 else f"bio of user {i} with naïve café text"),
            rng.randint(0, 10**6),
            rng.randint(0, 10**4),
            rng.randint(0, 5000),
            rng.randint(0, 100),
        )
        for i in range(6, 21)
    ]

    conversations = [
        # golden conversation: every child populated
        (1, "RT @WilburSoot: the fïancé's tweet <a href='x'>link</a> #Ukraine #Peace",
         False, "en", sources[0], 10, 2, 100, 1, _ts("2022-02-26T23:29:55"), 1),
        # (b) bare conversation: no children
        (2, "a quiet tweet with no children", False, "en", sources[1], 0, 0, 0, 0,
         _ts("2022-03-01T10:00:00"), 2),
        # (c) references parent 2 (which has no hashtags)
        (3, "replying to the quiet tweet", True, "sk", sources[2], 1, 1, 2, 0,
         _ts("2022-03-02T11:30:00"), 3),
    ] + [
        (
            i,
            f"tweet number {i} about topic{i % 7} #Tag{i % 5}",
            rng.random() < 0.1,
            rng.choice(langs),
            rng.choice(sources),
            rng.randint(0, 1000),
            rng.randint(0, 100),
            rng.randint(0, 5000),
            rng.randint(0, 50),
            _ts(f"2022-03-{(i % 28) + 1:02d}T{i % 24:02d}:15:00"),
            rng.randint(1, 20),
        )
        for i in range(4, n_conversations + 1)
    ]

    context_entities = [
        (10, "Wilbur Soot", "Wilbur Soot is an English YouTuber"),
        (11, "Music", None),
        (12, "Politics", "Political topics"),
    ] + [(12 + i, f"Entity {i}", None if i % 3 == 0 else f"entity {i} desc") for i in range(1, 48)]

    context_domains = [
        (123, "Person", "Named people in the world like Nelson Mandela"),
        (124, "Interests and Hobbies Category", None),
        (125, "Topic", "A topic"),
    ] + [(125 + i, f"Domain {i}", f"domain {i} desc") for i in range(1, 18)]

    entity_ids = [e[0] for e in context_entities]
    domain_ids = [d[0] for d in context_domains]
    context_annotations = [
        # golden: duplicated pair (sample_document.json:26-51)
        (1, 1, 10, 123),
        (2, 1, 10, 123),
        (3, 1, 11, 124),
    ]
    _ca_id = 4
    for i in range(4, n_conversations + 1):
        if rng.random() < 0.6:
            for _ in range(rng.randint(1, 3)):
                context_annotations.append(
                    (_ca_id, i, rng.choice(entity_ids), rng.choice(domain_ids))
                )
                _ca_id += 1

    hashtags = [(1, "Ukraine"), (2, "Peace"), (3, "Breaking")] + [
        (i, f"Tag{i}") for i in range(4, 101)
    ]
    conversation_hashtags = [(1, 1, 1), (2, 1, 2)]  # golden has two hashtags
    _ch_id = 3
    for i in range(4, n_conversations + 1):
        if rng.random() < 0.5:
            for hid in rng.sample(range(1, 101), rng.randint(1, 5)):
                conversation_hashtags.append((_ch_id, i, hid))
                _ch_id += 1

    annotations = [(1, 1, "UKRAINE", "Place", 0.6334)]
    _an_id = 2
    for i in range(4, n_conversations + 1):
        if rng.random() < 0.4:
            for _ in range(rng.randint(1, 3)):
                annotations.append(
                    (_an_id, i, f"VALUE{_an_id}", rng.choice(["Place", "Person", "Other"]),
                     round(rng.random(), 4))
                )
                _an_id += 1

    links = [(1, 1, "https://example.com/article", "An article", None)]
    _li_id = 2
    for i in range(4, n_conversations + 1):
        if rng.random() < 0.4:
            for _ in range(rng.randint(1, 3)):
                links.append(
                    (_li_id, i,
                     None if rng.random() < 0.05 else f"https://t.co/link{_li_id}",
                     None if rng.random() < 0.6 else f"title {_li_id}",
                     None if rng.random() < 0.6 else f"desc {_li_id}")
                )
                _li_id += 1

    conversation_references = [
        # golden references a conversation with hashtags and one without
        (1, 1, 4, "retweeted"),
        # (c) child 3 → parent 2 (no hashtags → nested null)
        (2, 3, 2, "replied_to"),
    ]
    _cr_id = 3
    for i in range(4, n_conversations + 1):
        if rng.random() < 0.3:
            parent = rng.randint(1, n_conversations)
            if parent != i:
                conversation_references.append(
                    (_cr_id, i, parent, rng.choice(["retweeted", "quoted", "replied_to"]))
                )
                _cr_id += 1

    data = {
        "conversations": conversations,
        "authors": authors,
        "context_annotations": context_annotations,
        "context_entities": context_entities,
        "context_domains": context_domains,
        "hashtags": hashtags,
        "conversation_hashtags": conversation_hashtags,
        "annotations": annotations,
        "links": links,
        "conversation_references": conversation_references,
    }
    return {
        name: spark.createDataFrame(rows, schema=schemas.TWEETS_TABLES[name])
        for name, rows in data.items()
    }

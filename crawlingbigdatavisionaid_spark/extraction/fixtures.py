"""Deterministic in-memory HTML fixtures exercising every branch of the
extraction cascades (FIXTURES.md §B). Shared by the driver-facing
queries (plans/extraction.py — oracle'd as SQL VALUES literals) and the
pytest unit suite. Never fetched from the network.
"""

from __future__ import annotations

# --- listing pages: (source, base_url, html) -------------------------------
LISTING_PAGES = [
    (
        "blogA",
        "https://bloga.example/",
        """
        <html><body>
          <article><h2>One</h2><a href="/posts/1">read</a></article>
          <article><a href="https://bloga.example/posts/2">read</a></article>
          <article><span>no link here</span></article>
          <article><a href="/posts/1">dup of first</a></article>
          <div class="post"><a href="/ignored">cascade stops at article</a></div>
        </body></html>
        """,
    ),
    (
        "blogB",
        "https://blogb.example/base/",
        """
        <html><body>
          <div class="post"><a href="p/9">nine</a></div>
          <div class="blog-post"><a href="/not-used">lower cascade tier</a></div>
        </body></html>
        """,
    ),
    (
        "blogC",
        "https://blogc.example/",
        """
        <html><body>
          <section class="entry-card"><a href="/c/5">five</a></section>
          <div class="sidebar">nothing</div>
        </body></html>
        """,
    ),
    ("blogD", "https://blogd.example/", "<html><body><p>no blocks</p></body></html>"),
]

# --- article pages: (url, html) --------------------------------------------
ARTICLE_PAGES = [
    (
        "https://bloga.example/posts/1",
        """
        <html><head><title>ignored</title></head><body>
          <h1> Alpha </h1>
          <p>first</p><p>   </p><p>second</p>
          <time datetime="2024-03-05T10:00:00">whenever</time>
        </body></html>
        """,
    ),
    (
        "https://bloga.example/posts/2",
        """
        <html><head><title>Beta</title></head><body>
          <p>only</p>
          <time>2024-03-06 12:30:00</time>
        </body></html>
        """,
    ),
    (
        "https://blogb.example/base/p/9",
        """
        <html><head>
          <meta property="article:published_time" content="2024-03-07T00:00:00+00:00">
        </head><body><p>niner</p></body></html>
        """,
    ),
    (
        "https://blogc.example/c/5",
        """
        <html><head><meta name="pubdate" content="notadate"></head>
        <body><p>cee</p><p>five</p></body></html>
        """,
    ),
]

# Expected extraction output after within-batch URL dedup
# (url, source, title, content, published_at)
EXPECTED_ARTICLES = [
    ("https://bloga.example/posts/1", "blogA", "Alpha", "first\nsecond",
     "2024-03-05T10:00:00"),
    ("https://bloga.example/posts/2", "blogA", "Beta", "only",
     "2024-03-06 12:30:00"),
    ("https://blogb.example/base/p/9", "blogB", "No Title Found", "niner",
     "2024-03-07T00:00:00+00:00"),
    ("https://blogc.example/c/5", "blogC", "No Title Found", "cee\nfive",
     "notadate"),
]

# URLs already in the simulated store for the anti-join scenario
EXISTING_URLS = ["https://bloga.example/posts/2"]

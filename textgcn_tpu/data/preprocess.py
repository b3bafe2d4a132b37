"""Offline preprocessing: raw Amazon per-category JSON -> clean TSVs.

Capability match for reference ``data/process_data.py:35-224``:

* metadata: keep {asin, title, description}, join description fragments,
  scrub unicode/HTML/emoji/unprintables, drop NA-like values;
* reviews: keep {reviewText, reviewerID, asin, unixReviewTime, overall},
  restrict to known asins, dedupe (user, asin), iterative 5-core filter;
* sync: iterate core-13 + asin-intersection to a fixpoint;
* split: stratified-by-user 80/20 requiring >= 3 interactions per user;
* outputs: ``meta_synced.tsv``, ``reviews_text.tsv``, ``train.tsv``,
  ``test.tsv``.

Implementation notes: stdlib ``json`` + ``unicodedata`` replace the
reference's orjson/unidecode (not in this image); the ASCII-fold step uses
NFKD-decompose-and-strip, which covers the common latin accents unidecode
handles.

Usage:  python -m textgcn_tpu.data.preprocess <domain_dir> [seed]
"""

from __future__ import annotations

import html
import json
import os
import re
import string
import sys
import unicodedata

import numpy as np
import pandas as pd

_PRINTABLE = string.punctuation + string.ascii_letters + string.digits + ' '
_UNPRINTABLE = re.compile(f'[^{re.escape(_PRINTABLE)}]')
_HTML_TAG = re.compile(r'<[^<]+?>')
_WS = re.compile(r'[\s_]+')

# Strings that should read as missing after cleaning.  Mirrors pandas'
# default read-time NA sentinels (the reference relies on the same set at
# ``data/process_data.py``); grouped by family, materialized as a list
# because ``DataFrame.replace`` wants one.
_NA_FAMILIES = (
    ('',),                                       # cleaned-to-empty text
    ('NA', 'N/A', 'n/a', '<NA>', 'NULL', 'null'),
    ('NaN', 'nan', '-NaN', '-nan'),
    ('#NA', '#N/A', '#N/A N/A'),                 # spreadsheet errors
    ('1.#IND', '-1.#IND', '1.#QNAN', '-1.#QNAN'),
)
NA_VALUES = [s for family in _NA_FAMILIES for s in family]


def clean_text(s) -> str:
    """Normalize one text field (reference ``process_data.py:45-60``).

    ASCII-fold -> HTML-unescape -> strip tags -> drop non-printables ->
    collapse whitespace/underscores -> strip leading punctuation; texts
    of <= 5 chars become empty (dropped later as NA).
    """
    if not isinstance(s, str):
        return ''
    s = unicodedata.normalize('NFKD', s)
    s = s.encode('ascii', 'ignore').decode('ascii')
    s = html.unescape(s)
    s = _HTML_TAG.sub('', s)
    s = _UNPRINTABLE.sub('', s)
    s = _WS.sub(' ', s)
    s = s.lstrip(string.punctuation)
    return s if len(s) > 5 else ''


def _iter_json(path: str):
    with open(path, 'r') as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def process_metadata(path: str) -> pd.DataFrame:
    fields = ['title', 'description', 'asin']
    rows = []
    for row in _iter_json(path):
        if all(k in row for k in fields):
            rows.append({k: row[k] for k in fields})
    df = pd.DataFrame(rows).drop_duplicates('asin')
    desc = df['description'].apply(
        lambda d: ' '.join(d) if isinstance(d, list) else str(d))
    df = df.assign(description=desc.apply(clean_text),
                   title=df['title'].apply(clean_text))
    return df.replace(NA_VALUES, np.nan).dropna().reset_index(drop=True)


def core_n(df: pd.DataFrame, n: int = 5,
           columns=('asin', 'user_id')) -> pd.DataFrame:
    """Prune rows until every value in each key column occurs >= n times.

    Dropping a sparse user can push an item below the threshold and vice
    versa, so the filter runs to a fixpoint.  The n-core of the bipartite
    interaction graph is unique (peeling order does not matter), so one
    combined keep-mask per pass converges to the same subgraph as the
    reference's sequential per-column peel (``data/process_data.py:140-156``).
    """
    while True:
        keep = pd.Series(True, index=df.index)
        for col in columns:
            keep &= df.groupby(col)[col].transform('size') >= n
        if keep.all():
            return df
        df = df[keep]


def process_reviews(path: str, available_asins: set) -> pd.DataFrame:
    fields = ['reviewText', 'reviewerID', 'asin', 'unixReviewTime',
              'overall']
    rows = []
    for row in _iter_json(path):
        if all(k in row for k in fields) and row['asin'] in available_asins:
            rows.append({k: row[k] for k in fields})
    df = (pd.DataFrame(rows)
          .rename(columns={'reviewerID': 'user_id', 'reviewText': 'review',
                           'unixReviewTime': 'time', 'overall': 'rating'})
          .drop_duplicates(subset=['user_id', 'asin'])
          .astype({'rating': int})
          .replace(NA_VALUES, np.nan)
          .dropna())
    df = core_n(df, n=5)
    df = df.assign(review=df.review.apply(clean_text))
    return df.dropna().reset_index(drop=True)


def sync(meta: pd.DataFrame, reviews: pd.DataFrame, n: int = 1):
    """Restrict meta and reviews to a shared asin universe on which the
    reviews also satisfy the n-core.

    Intersecting the asin sets can break the core property and re-coring
    can shrink the asin set, so the two steps alternate until a pass
    removes nothing.  Capability match for reference
    ``data/process_data.py:158-171`` (n=1 degenerates to one intersection,
    which is idempotent, so the loop form covers it too).
    """
    while True:
        rows_before = len(meta) + len(reviews)
        if n > 1:
            reviews = core_n(reviews, n)
        shared = set(meta['asin']).intersection(reviews['asin'])
        meta = meta[meta['asin'].isin(shared)]
        reviews = reviews[reviews['asin'].isin(shared)]
        if len(meta) + len(reviews) == rows_before:
            return meta, reviews


def train_test_split(df: pd.DataFrame, column: str = 'user_id',
                     train_size: float = 0.8, seed: int = 42):
    """Stratified split keeping every user in both sets (reference
    ``process_data.py:175-189``)."""
    from sklearn.model_selection import train_test_split as tts

    sizes = df.groupby(column)[column].transform('size')
    filtered = df[sizes >= 3]
    return tts(filtered, stratify=filtered[column],
               train_size=train_size, random_state=seed)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print('usage: python -m textgcn_tpu.data.preprocess <domain> [seed]')
        sys.exit(1)
    domain = argv[0].rstrip('/')
    seed = int(argv[1]) if len(argv) > 1 else 42

    meta = process_metadata(os.path.join(
        domain, f'meta_{os.path.basename(domain)}.json'))
    reviews = process_reviews(
        os.path.join(domain, f'{os.path.basename(domain)}.json'),
        available_asins=set(meta.asin))

    meta, reviews = sync(meta, reviews, n=13)
    meta.to_csv(os.path.join(domain, 'meta_synced.tsv'), sep='\t',
                index=False)
    reviews.to_csv(os.path.join(domain, 'reviews_text.tsv'), sep='\t',
                   index=False)

    train, test = train_test_split(reviews, seed=seed)
    train.to_csv(os.path.join(domain, 'train.tsv'), sep='\t', index=False)
    test.to_csv(os.path.join(domain, 'test.tsv'), sep='\t', index=False)

    summary = {
        'reviews': len(reviews),
        'users': reviews['user_id'].nunique(),
        'items': reviews['asin'].nunique(),
        'train': len(train),
        'test': len(test),
    }
    for name, count in summary.items():
        print(f'{name + ":":<9}{count:>7}')


if __name__ == '__main__':
    main()

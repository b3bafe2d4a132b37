"""Generate the checked-in dummy fixture dataset at data/dummy/.

Extends the reference's CPU-runnable fixture idea (reference
``data/dummy/``: train/test/kg tsvs) with ``reviews_text.tsv`` and
``meta_synced.tsv`` so the LTR model family is testable end-to-end
(the reference fixture cannot run its own ltr_* models — SURVEY.md §4).

Deterministic; regenerate with:  python tools/make_dummy.py
"""

import os

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), '..', 'data', 'dummy')

N_USERS = 12
N_ITEMS = 10
SEED = 7


def main():
    rng = np.random.RandomState(SEED)
    os.makedirs(OUT, exist_ok=True)

    rows = []
    for u in range(N_USERS):
        n_inter = rng.randint(4, 8)
        items = rng.choice(N_ITEMS, size=n_inter, replace=False)
        for i in items:
            rows.append((f'user_{u}', f'asin_{i}'))
    df = pd.DataFrame(rows, columns=['user_id', 'asin'])

    # per-user split: last item to test, rest to train
    train_rows, test_rows = [], []
    for u, group in df.groupby('user_id'):
        g = group.sample(frac=1.0, random_state=rng)
        test_rows.append(g.iloc[:1])
        train_rows.append(g.iloc[1:])
    train = pd.concat(train_rows).sort_values(['user_id', 'asin'])
    test = pd.concat(test_rows).sort_values(['user_id', 'asin'])
    # drop test items that are not in train
    test = test[test.asin.isin(train.asin.unique())]
    train.to_csv(os.path.join(OUT, 'train.tsv'), sep='\t', index=False)
    test.to_csv(os.path.join(OUT, 'test.tsv'), sep='\t', index=False)

    # meta: title + description per item
    meta = pd.DataFrame({
        'asin': [f'asin_{i}' for i in range(N_ITEMS)],
        'title': [f'item number {i} title words' for i in range(N_ITEMS)],
        'description': [f'a longer description of item {i} with detail '
                        f'{i * 3}' for i in range(N_ITEMS)],
    })
    meta.to_csv(os.path.join(OUT, 'meta_synced.tsv'), sep='\t', index=False)

    # reviews: one per train interaction with synthetic time stamps
    reviews = train.copy()
    reviews['review'] = [
        f'review text from {u} about {a} opinion {j}'
        for j, (u, a) in enumerate(zip(reviews.user_id, reviews.asin))]
    reviews['time'] = rng.randint(1_500_000_000, 1_600_000_000,
                                  size=len(reviews))
    reviews['rating'] = rng.randint(1, 6, size=len(reviews))
    reviews = reviews[['user_id', 'asin', 'review', 'time', 'rating']]
    reviews.to_csv(os.path.join(OUT, 'reviews_text.tsv'), sep='\t',
                   index=False)
    print(f'wrote dummy fixture: {len(train)} train, {len(test)} test, '
          f'{N_USERS} users, {N_ITEMS} items')


if __name__ == '__main__':
    main()

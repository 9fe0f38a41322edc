"""Pure NumPy/SciPy oracle implementations of every similarity.

Adopted from the reference's test strategy (reference:
tests/test_similarity.py:8-231): slow, readable reimplementations plus the
tie-robust `check_sum` scalar (top-K can break score ties on different
indices, so equality is checked via the permutation-invariant
sum-of-squared-row-sums) and element-wise `check_full` for k == n_cols.
"""

import numpy as np
import scipy.sparse as sp

from similaripy_tpu.normalization import normalize


def check_sum(x):
    aux = np.asarray(x.sum(axis=1)).ravel()
    return np.sum(np.power(aux, 2))


def check_full(x1, x2, rtol=0.001):
    x1 = x1.tocsr()
    x2 = x2.tocsr()
    for i in range(x1.shape[0]):
        indices = x1.indices[x1.indptr[i] : x1.indptr[i + 1]]
        for c in indices:
            np.testing.assert_allclose(x1[i, c], x2[i, c], rtol=rtol, err_msg="error test_full")
    return 0


def top_k(X, k):
    X = X.tocsr()
    r, c, d = [], [], []
    for i in range(X.shape[0]):
        data = X.data[X.indptr[i] : X.indptr[i + 1]]
        topk = min(k, data.shape[0])
        indices = X.indices[X.indptr[i] : X.indptr[i + 1]]
        if topk == 0:
            continue
        topk_idx = np.argpartition(data, -topk)[-topk:]
        r += [i] * topk
        c += indices[topk_idx].tolist()
        d += data[topk_idx].tolist()
    return sp.csr_array((d, (r, c)), shape=X.shape)


def col_scale(X, array_scale):
    X = X.tocsr()
    X.data *= array_scale.take(X.indices, mode="clip")
    return X


def py_dot(m, k):
    return top_k(m @ m.T, k)


def py_cosine(m, k, h=0, shrink_mode="stabilized"):
    additive_h = h if shrink_mode == "additive" else 0
    m2 = m.copy()
    m2.data = np.power(m2.data, 2)
    X = np.power(np.asarray(m2.sum(axis=1)).ravel() + additive_h, 0.5)
    m_aux = (m @ m.T).tocsr()
    r, c, v = [], [], []
    for idx1 in range(m.shape[0]):
        for idx2 in range(m_aux.indptr[idx1], m_aux.indptr[idx1 + 1]):
            row, col, val = idx1, m_aux.indices[idx2], m_aux.data[idx2]
            r.append(row)
            c.append(col)
            if shrink_mode == "stabilized":
                v.append(val / (X[row] * X[col] + h))
            elif shrink_mode == "bayesian":
                v.append(val / (X[row] * X[col]) * (val / (val + h)))
            elif shrink_mode == "additive":
                v.append(val / (X[row] * X[col]))
    s = sp.csr_array((v, (r, c)), shape=(m.shape[0], m.shape[0]))
    return top_k(s, k)


def py_asy_cosine(m, alpha, k):
    m2 = m.copy()
    m2.data = np.power(m2.data, 2)
    X = np.power(np.asarray(m2.sum(axis=1)).ravel(), alpha)
    Y = np.power(np.asarray(m2.sum(axis=1)).ravel(), 1 - alpha)
    m_aux = (m @ m.T).tocsr()
    r, c, v = [], [], []
    for idx1 in range(m.shape[0]):
        for idx2 in range(m_aux.indptr[idx1], m_aux.indptr[idx1 + 1]):
            row, col, val = idx1, m_aux.indices[idx2], m_aux.data[idx2]
            r.append(row)
            c.append(col)
            v.append(val / (X[row] * Y[col]))
    s = sp.csr_array((v, (r, c)), shape=(m.shape[0], m.shape[0]))
    return top_k(s, k)


def py_jaccard(m, k):
    X = np.asarray(m.power(2).sum(axis=1)).ravel()
    m_aux = (m @ m.T).tocsr()
    r, c, v = [], [], []
    for idx1 in range(m.shape[0]):
        for idx2 in range(m_aux.indptr[idx1], m_aux.indptr[idx1 + 1]):
            row, col, val = idx1, m_aux.indices[idx2], m_aux.data[idx2]
            r.append(row)
            c.append(col)
            v.append(val / (X[row] + X[col] - val))
    s = sp.csr_array((v, (r, c)), shape=(m.shape[0], m.shape[0]))
    return top_k(s, k)


def py_dice(m, k):
    X = np.asarray(m.power(2).sum(axis=1)).ravel()
    m_aux = (m @ m.T).tocsr()
    r, c, v = [], [], []
    for idx1 in range(m.shape[0]):
        for idx2 in range(m_aux.indptr[idx1], m_aux.indptr[idx1 + 1]):
            row, col, val = idx1, m_aux.indices[idx2], m_aux.data[idx2]
            r.append(row)
            c.append(col)
            v.append(2 * val / (X[row] + X[col]))
    s = sp.csr_array((v, (r, c)), shape=(m.shape[0], m.shape[0]))
    return top_k(s, k)


def py_tversky(m, alpha, beta, k):
    X = np.asarray(m.power(2).sum(axis=1)).ravel()
    m_aux = (m @ m.T).tocsr()
    r, c, v = [], [], []
    for idx1 in range(m.shape[0]):
        for idx2 in range(m_aux.indptr[idx1], m_aux.indptr[idx1 + 1]):
            row, col, val = idx1, m_aux.indices[idx2], m_aux.data[idx2]
            r.append(row)
            c.append(col)
            v.append(val / (alpha * (X[row] - val) + beta * (X[col] - val) + val))
    s = sp.csr_array((v, (r, c)), shape=(m.shape[0], m.shape[0]))
    return top_k(s, k)


def py_p3alpha(m, alpha, k):
    m2 = m.copy().T
    m1 = normalize(m, axis=1, norm="l1")
    m2 = normalize(m2, axis=1, norm="l1")
    m1.data = np.power(m1.data, alpha)
    m2.data = np.power(m2.data, alpha)
    return top_k(m1 @ m2, k)


def py_rp3beta(m, alpha, beta, k):
    pop = np.power(np.asarray(m.sum(axis=1)).ravel(), beta)
    pop_inv = np.divide(1, pop, out=np.zeros_like(pop), where=pop != 0)
    m2 = m.copy().T
    m1 = normalize(m, axis=1, norm="l1")
    m2 = normalize(m2, axis=1, norm="l1")
    m1.data = np.power(m1.data, alpha)
    m2.data = np.power(m2.data, alpha)
    m_aux = col_scale(m1 @ m2, pop_inv)
    return top_k(m_aux, k)


def py_s_plus(
    m,
    k,
    l1=0.5,
    l2=0.5,
    l3=0.0,
    t1=1.0,
    t2=1.0,
    c1=0.5,
    c2=0.5,
    alpha=1.0,
    beta1=0.0,
    beta2=0.0,
    pop1="none",
    pop2="none",
):
    m_aux = (m @ m.T).tocsr()
    sq = m.copy()
    sq.data **= 2
    Xtversky = np.asarray(sq.sum(axis=1)).ravel()
    Ytversky = Xtversky.copy()
    Xcosine = np.power(Xtversky, c1)
    Ycosine = np.power(Ytversky, c2)
    if pop1 == "sum":
        Xdepop = np.power(np.asarray(m.sum(axis=1)).ravel(), beta1)
    else:
        Xdepop = np.ones(m.shape[0])
    if pop2 == "sum":
        Ydepop = np.power(np.asarray(m.sum(axis=1)).ravel(), beta2)
    else:
        Ydepop = np.ones(m.shape[0])

    r, c, v = [], [], []
    for i in range(m_aux.shape[0]):
        for j in range(m_aux.indptr[i], m_aux.indptr[i + 1]):
            row, col, xy = i, m_aux.indices[j], m_aux.data[j]
            valT = l1 * (t1 * (Xtversky[row] - xy) + t2 * (Ytversky[col] - xy) + xy) if l1 != 0 else 0
            valC = l2 * (Xcosine[row] * Ycosine[col]) if l2 != 0 else 0
            valD = l3 * (Xdepop[row] * Ydepop[col]) if l3 != 0 else 0
            denom = valT + valC + valD
            if alpha != 1.0:
                xy = np.power(xy, alpha)
            val = xy / denom if denom > 0 else 0
            r.append(row)
            c.append(col)
            v.append(val)
    s = sp.csr_array((v, (r, c)), shape=(m.shape[0], m.shape[0]))
    return top_k(s, k)


def generate_random_matrix(n_rows=100, n_cols=50, density=0.05, seed=42):
    rng = np.random.default_rng(seed)
    return sp.random_array(
        (n_rows, n_cols), density=density, format="csr", dtype=np.float32, random_state=rng
    )

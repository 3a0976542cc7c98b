"""Independent numpy golden implementations of the reference formulas.

Written directly from the mathematical definitions (dense 4D
correlation, mutual-matching gate, 4D conv as a literal 8-nested loop,
epipolar distances) so the jnp/Pallas ops can be validated without
depending on torch or the reference code.
"""

import numpy as np


def l2_normalize_np(x, axis=-1, eps=1e-6):
    return x / np.sqrt(np.sum(x**2, axis=axis, keepdims=True) + eps)


def feat_correlation_np(f1, f2):
    """f1 (B,h1,w1,C), f2 (B,h2,w2,C) -> (B,h1,w1,h2,w2)."""
    return np.einsum("bijc,bklc->bijkl", f1, f2)


def mutual_matching_np(corr, eps=1e-5):
    max_a = corr.max(axis=(1, 2), keepdims=True)
    max_b = corr.max(axis=(3, 4), keepdims=True)
    return corr * ((corr / (max_a + eps)) * (corr / (max_b + eps)))


def maxpool4d_np(corr, k):
    """Literal windowed max over all k^4 cells; returns pooled + offsets."""
    b, h1, w1, h2, w2 = corr.shape
    ph1, pw1, ph2, pw2 = h1 // k, w1 // k, h2 // k, w2 // k
    pooled = np.zeros((b, ph1, pw1, ph2, pw2), corr.dtype)
    di = np.zeros_like(pooled, dtype=np.int32)
    dj = np.zeros_like(di)
    dk = np.zeros_like(di)
    dl = np.zeros_like(di)
    for bi in range(b):
        for i in range(ph1):
            for j in range(pw1):
                for m in range(ph2):
                    for n in range(pw2):
                        win = corr[
                            bi,
                            i * k : (i + 1) * k,
                            j * k : (j + 1) * k,
                            m * k : (m + 1) * k,
                            n * k : (n + 1) * k,
                        ]
                        flat = win.reshape(-1)
                        a = int(np.argmax(flat))
                        pooled[bi, i, j, m, n] = flat[a]
                        dl[bi, i, j, m, n] = a % k
                        dk[bi, i, j, m, n] = (a // k) % k
                        dj[bi, i, j, m, n] = (a // k**2) % k
                        di[bi, i, j, m, n] = a // k**3
    return pooled, (di, dj, dk, dl)


def conv4d_np(x, w, bias=None):
    """Literal SAME 4D convolution.

    x (B,h1,w1,h2,w2,Cin), w (k,k,k,k,Cin,Cout) -> (B,...,Cout).
    """
    k = w.shape[0]
    pad = k // 2
    b, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]
    xp = np.zeros((b, h1 + 2 * pad, w1 + 2 * pad, h2 + 2 * pad, w2 + 2 * pad, cin), x.dtype)
    xp[:, pad : pad + h1, pad : pad + w1, pad : pad + h2, pad : pad + w2] = x
    out = np.zeros((b, h1, w1, h2, w2, cout), x.dtype)
    for di in range(k):
        for dj in range(k):
            for dk in range(k):
                for dl in range(k):
                    patch = xp[:, di : di + h1, dj : dj + w1, dk : dk + h2, dl : dl + w2]
                    out += np.einsum("bijklc,cd->bijkld", patch, w[di, dj, dk, dl])
    if bias is not None:
        out += bias
    return out


def sampson_np(matches, F, eps=1e-8):
    n = matches.shape[0]
    p1 = np.concatenate([matches[:, :2], np.ones((n, 1))], axis=1)
    p2 = np.concatenate([matches[:, 2:4], np.ones((n, 1))], axis=1)
    l2 = F @ p1.T
    l1 = F.T @ p2.T
    dd = np.sum(l2.T * p2, axis=1)
    return dd**2 / (eps + l1[0] ** 2 + l1[1] ** 2 + l2[0] ** 2 + l2[1] ** 2)


def sym_epi_np(matches, F, eps=1e-8):
    n = matches.shape[0]
    p1 = np.concatenate([matches[:, :2], np.ones((n, 1))], axis=1)
    p2 = np.concatenate([matches[:, 2:4], np.ones((n, 1))], axis=1)
    l2 = F @ p1.T
    l1 = F.T @ p2.T
    dd = np.sum(l2.T * p2, axis=1)
    return dd**2 * (
        1.0 / (eps + l1[0] ** 2 + l1[1] ** 2) + 1.0 / (eps + l2[0] ** 2 + l2[1] ** 2)
    )


def softmax_np(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def corr_matches_reference_np(corr, delta4d=None, ksize=1):
    """Reference-semantics match extraction: both directions, unique rows.

    Returns, per batch element, the list of unique rows (x1,y1,x2,y2)
    with their first-occurrence scores and occurrence counts — mirroring
    np.unique on the concatenated direction lists.
    """
    b, h1, w1, h2, w2 = corr.shape
    flat = corr.reshape(b, h1 * w1, h2 * w2)
    out = []
    for bi in range(b):
        rows, scores = [], []
        s1 = softmax_np(flat[bi], axis=0)
        for nb in range(h2 * w2):
            a = int(np.argmax(flat[bi, :, nb]))
            ia, ja = a // w1, a % w1
            ib, jb = nb // w2, nb % w2
            rows.append((ia, ja, ib, jb))
            scores.append(s1[a, nb])
        s2 = softmax_np(flat[bi], axis=1)
        for na in range(h1 * w1):
            bidx = int(np.argmax(flat[bi, na, :]))
            ia, ja = na // w1, na % w1
            ib, jb = bidx // w2, bidx % w2
            rows.append((ia, ja, ib, jb))
            scores.append(s2[na, bidx])
        reloc = []
        for (ia, ja, ib, jb) in rows:
            if delta4d is not None:
                di, dj, dk, dl = (d[bi] for d in delta4d)
                reloc.append(
                    (
                        ia * ksize + di[ia, ja, ib, jb],
                        ja * ksize + dj[ia, ja, ib, jb],
                        ib * ksize + dk[ia, ja, ib, jb],
                        jb * ksize + dl[ia, ja, ib, jb],
                    )
                )
            else:
                reloc.append((ia * ksize, ja * ksize, ib * ksize, jb * ksize))
        # np.unique equivalent: first occurrence + counts
        seen = {}
        for idx, r in enumerate(reloc):
            key = (r[1], r[0], r[3], r[2])  # x1, y1, x2, y2
            if key not in seen:
                seen[key] = [idx, 0, scores[idx]]
            seen[key][1] += 1
        out.append(seen)
    return out

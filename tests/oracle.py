"""NumPy oracle: direct float64 transliterations of the reference CPU
algorithms (per-doc sweeps, per-doc viter break), used to validate the
batch-synchronous TPU implementations update-by-update.

Each function cites the reference equation it implements.  These are
*oracles*, not the product: deliberately naive, loop-heavy, and slow.
"""

from __future__ import annotations

import numpy as np
from scipy.special import digamma, gammaln, polygamma

EPS = float(np.spacing(1e-14))


def _softmax_cols(x):
    x = x - x.max(axis=0, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=0, keepdims=True)


class LDAOracle:
    """Reference CPU LDA (LDA.jl), float64, per-doc sweep."""

    def __init__(self, docs, V, K, beta0, alpha0=None):
        """docs: list of (terms0based, counts) numpy arrays."""
        self.docs = [(np.asarray(t, np.int64), np.asarray(c, np.float64)) for t, c in docs]
        self.M, self.V, self.K = len(docs), V, K
        self.alpha = np.ones(K) if alpha0 is None else np.asarray(alpha0, np.float64).copy()
        self.beta = np.asarray(beta0, np.float64).copy()
        self.beta_old = self.beta.copy()
        self.beta_temp = np.zeros((K, V))
        el0 = -np.euler_gamma - digamma(K)
        self.Elogtheta = [np.full(K, el0) for _ in range(self.M)]
        self.Elogtheta_old = [e.copy() for e in self.Elogtheta]
        self.gamma = [np.ones(K) for _ in range(self.M)]
        self.phi = None
        self.elbo = 0.0

    # update_phi! (LDA.jl:150-154)
    def update_phi(self, d):
        terms, _ = self.docs[d]
        phi = self.beta[:, terms] * np.exp(self.Elogtheta[d])[:, None] + EPS
        self.phi = phi / phi.sum(axis=0, keepdims=True)

    # update_gamma! (LDA.jl:143-146)
    def update_gamma(self, d):
        _, counts = self.docs[d]
        self.gamma[d] = EPS + self.alpha + self.phi @ counts

    # update_Elogtheta! (LDA.jl:136-139)
    def update_Elogtheta(self, d):
        self.Elogtheta_old[d] = self.Elogtheta[d]
        g = self.gamma[d]
        self.Elogtheta[d] = digamma(g) - digamma(g.sum())

    # update_beta! streaming stat (LDA.jl:129-132)
    def accum_beta(self, d):
        terms, counts = self.docs[d]
        np.add.at(self.beta_temp, (slice(None), terms), self.phi * counts[None, :])

    # update_beta! reset (LDA.jl:121-125)
    def swap_beta(self):
        self.beta_old = self.beta
        self.beta = self.beta_temp / self.beta_temp.sum(axis=1, keepdims=True)
        self.beta_temp = np.zeros((self.K, self.V))

    # update_alpha! (LDA.jl:97-118)
    def update_alpha(self, niter, ntol):
        El_sum = np.sum(self.Elogtheta, axis=0)
        nu = float(self.K)
        for _ in range(niter):
            rho = 1.0
            a0 = self.alpha.sum()
            grad = nu / self.alpha + self.M * (digamma(a0) - digamma(self.alpha)) + El_sum
            h_inv = -1.0 / (self.M * polygamma(1, self.alpha) + nu / self.alpha**2)
            p = (grad - grad @ h_inv / (1.0 / (self.M * polygamma(1, a0)) + h_inv.sum())) * h_inv
            while np.min(self.alpha - rho * p) < 0:
                rho *= 0.5
            self.alpha = self.alpha - rho * p
            if (rho * np.linalg.norm(grad) < ntol) and (nu / self.K < ntol):
                break
            nu *= 0.5
        self.alpha = self.alpha + EPS

    # update_elbo! (LDA.jl:50-93)
    def update_elbo(self):
        total = 0.0
        a = self.alpha
        for d in range(self.M):
            terms, counts = self.docs[d]
            phi = self.beta_old[:, terms] * np.exp(self.Elogtheta_old[d])[:, None] + EPS
            phi = phi / phi.sum(axis=0, keepdims=True)
            g, el = self.gamma[d], self.Elogtheta[d]
            e_ptheta = gammaln(a.sum()) - gammaln(a).sum() + (a - 1) @ el
            e_pz = (phi @ counts) @ el
            e_pw = np.sum(phi * np.log(self.beta[:, terms] + EPS) * counts[None, :])
            a0 = g.sum()
            lmnb = gammaln(g).sum() - gammaln(a0)
            e_qtheta_entropy = lmnb + (a0 - self.K) * digamma(a0) - np.sum(
                (g - 1) * digamma(g)
            )
            e_qz_entropy = -np.sum(counts * np.sum(phi * np.log(phi), axis=0))
            total += e_ptheta + e_pz + e_pw + e_qtheta_entropy + e_qz_entropy
        self.elbo = total
        return total

    # train! (LDA.jl:161-191)
    def train(self, iters, viter=10, vtol=None, niter=1000, ntol=None):
        vtol = 1.0 / self.K**2 if vtol is None else vtol
        ntol = 1.0 / self.K**2 if ntol is None else ntol
        elbos = []
        for _ in range(iters):
            for d in range(self.M):
                for _v in range(viter):
                    self.update_phi(d)
                    self.update_gamma(d)
                    self.update_Elogtheta(d)
                    if np.linalg.norm(self.Elogtheta[d] - self.Elogtheta_old[d]) < vtol:
                        break
                self.update_phi_final_stat(d)
            self.swap_beta()
            self.update_alpha(niter, ntol)
            elbos.append(self.update_elbo())
        return elbos

    def update_phi_final_stat(self, d):
        # The reference uses phi as left by the last update_phi! call
        # (computed from Elogtheta before its final in-loop update,
        # i.e. Elogtheta_old).
        terms, _ = self.docs[d]
        phi = self.beta[:, terms] * np.exp(self.Elogtheta_old[d])[:, None] + EPS
        self.phi = phi / phi.sum(axis=0, keepdims=True)
        self.accum_beta(d)


class FLDAOracle:
    """Reference CPU fLDA (fLDA.jl), float64, per-doc sweep."""

    def __init__(self, docs, V, K, beta0, kappa0):
        self.docs = [(np.asarray(t, np.int64), np.asarray(c, np.float64)) for t, c in docs]
        self.M, self.V, self.K = len(docs), V, K
        self.eta = 0.5
        self.alpha = np.ones(K)
        self.kappa = np.asarray(kappa0, np.float64).copy()
        self.kappa_old = self.kappa.copy()
        self.kappa_temp = np.zeros(V)
        self.beta = np.asarray(beta0, np.float64).copy()
        self.beta_old = self.beta.copy()
        self.beta_temp = np.zeros((K, V))
        el0 = -np.euler_gamma - digamma(K)
        self.Elogtheta = [np.full(K, el0) for _ in range(self.M)]
        self.Elogtheta_old = [e.copy() for e in self.Elogtheta]
        self.gamma = [np.ones(K) for _ in range(self.M)]
        self.tau = [np.full(len(t), self.eta) for t, _ in self.docs]
        self.tau_old = [t.copy() for t in self.tau]
        self.phi = None
        self.elbo = 0.0
        self.C = [c.sum() for _, c in self.docs]

    # update_phi! (fLDA.jl:204-207)
    def update_phi(self, d):
        terms, _ = self.docs[d]
        x = self.tau[d][None, :] * np.log(self.beta[:, terms] + EPS) + self.Elogtheta[d][:, None]
        self.phi = _softmax_cols(x)

    # update_tau! (fLDA.jl:195-200)
    def update_tau(self, d):
        self.tau_old[d] = self.tau[d]
        terms, _ = self.docs[d]
        prod = np.prod(self.beta[:, terms] ** (-self.phi), axis=0)
        self.tau[d] = self.eta / (self.eta + (1 - self.eta) * self.kappa[terms] * prod + EPS)

    def update_gamma(self, d):
        _, counts = self.docs[d]
        self.gamma[d] = EPS + self.alpha + self.phi @ counts

    def update_Elogtheta(self, d):
        self.Elogtheta_old[d] = self.Elogtheta[d]
        g = self.gamma[d]
        self.Elogtheta[d] = digamma(g) - digamma(g.sum())

    # update_beta! / update_kappa! streaming stats (fLDA.jl:174-177, 160-163)
    def accum(self, d):
        terms, counts = self.docs[d]
        np.add.at(self.beta_temp, (slice(None), terms),
                  self.phi * (self.tau[d] * counts)[None, :])
        np.add.at(self.kappa_temp, terms, (1 - self.tau[d]) * counts)

    def swap(self):
        self.beta_old = self.beta
        self.beta = self.beta_temp / self.beta_temp.sum(axis=1, keepdims=True)
        self.beta_temp = np.zeros((self.K, self.V))
        self.kappa_old = self.kappa
        self.kappa = self.kappa_temp / self.kappa_temp.sum()
        self.kappa_temp = np.zeros(self.V)

    def update_alpha(self, niter, ntol):
        LDAOracle.update_alpha(self, niter, ntol)

    # update_eta! (fLDA.jl:122-124)
    def update_eta(self):
        self.eta = sum(
            self.tau[d] @ self.docs[d][1] for d in range(self.M)
        ) / sum(self.C)

    # update_elbo! (fLDA.jl:109-118)
    def update_elbo(self):
        total = 0.0
        a = self.alpha
        for d in range(self.M):
            terms, counts = self.docs[d]
            x = self.tau_old[d][None, :] * np.log(self.beta_old[:, terms] + EPS) \
                + self.Elogtheta_old[d][:, None]
            phi = _softmax_cols(x)
            g, el, ta = self.gamma[d], self.Elogtheta[d], self.tau[d]
            e_ptheta = gammaln(a.sum()) - gammaln(a).sum() + (a - 1) @ el
            tc = ta @ counts
            e_pc = np.log(self.eta**tc * (1 - self.eta) ** (self.C[d] - tc) + EPS)
            e_pz = (phi @ counts) @ el
            e_pw = np.sum(phi * np.log(self.beta[:, terms] + EPS) * (counts * ta)[None, :]) \
                + (counts * (1 - ta)) @ np.log(self.kappa[terms] + EPS)
            a0 = g.sum()
            e_qtheta = (gammaln(g).sum() - gammaln(a0)) + (a0 - self.K) * digamma(a0) \
                - np.sum((g - 1) * digamma(g))
            with np.errstate(divide="ignore", invalid="ignore"):
                tl = np.where(ta > 0, ta * np.log(ta), 0.0)
                tl1 = np.where(ta < 1, (1 - ta) * np.log(1 - ta), 0.0)
            e_qc = -(counts @ (tl + tl1))
            e_qz = -np.sum(counts * np.sum(phi * np.log(phi), axis=0))
            total += e_ptheta + e_pc + e_pz + e_pw + e_qtheta + e_qc + e_qz
        self.elbo = total
        return total

    # train! (fLDA.jl:214-248)
    def train(self, iters, viter=10, vtol=None, niter=1000, ntol=None):
        vtol = 1.0 / self.K**2 if vtol is None else vtol
        ntol = 1.0 / self.K**2 if ntol is None else ntol
        elbos = []
        for _ in range(iters):
            for d in range(self.M):
                for _v in range(viter):
                    self.update_phi(d)
                    self.update_tau(d)
                    self.update_gamma(d)
                    self.update_Elogtheta(d)
                    if np.linalg.norm(self.Elogtheta[d] - self.Elogtheta_old[d]) < vtol:
                        break
                # final phi for stats = f(beta, tau_old, Elogtheta_old)
                terms, _ = self.docs[d]
                x = self.tau_old[d][None, :] * np.log(self.beta[:, terms] + EPS) \
                    + self.Elogtheta_old[d][:, None]
                self.phi = _softmax_cols(x)
                self.accum(d)
            self.swap()
            self.update_alpha(niter, ntol)
            self.update_eta()
            elbos.append(self.update_elbo())
        return elbos


class CTMOracle:
    """Reference CPU CTM (CTM.jl), float64, per-doc sweep."""

    def __init__(self, docs, V, K, beta0):
        self.docs = [(np.asarray(t, np.int64), np.asarray(c, np.float64)) for t, c in docs]
        self.M, self.V, self.K = len(docs), V, K
        self.mu = np.zeros(K)
        self.sigma = np.eye(K)
        self.invsigma = np.eye(K)
        self.beta = np.asarray(beta0, np.float64).copy()
        self.beta_old = self.beta.copy()
        self.beta_temp = np.zeros((K, V))
        self.lam = [np.zeros(K) for _ in range(self.M)]
        self.lam_old = [np.zeros(K) for _ in range(self.M)]
        self.vsq = [np.ones(K) for _ in range(self.M)]
        self.logzeta = np.full(self.M, 0.5)
        self.C = [c.sum() for _, c in self.docs]
        self.phi = None
        self.elbo = 0.0

    def update_phi(self, d):
        terms, _ = self.docs[d]
        with np.errstate(divide="ignore"):
            self.phi = _softmax_cols(np.log(self.beta[:, terms]) + self.lam[d][:, None])

    def update_logzeta(self, d):
        x = self.lam[d] + 0.5 * self.vsq[d]
        m = x.max()
        self.logzeta[d] = m + np.log(np.exp(x - m).sum())

    # update_vsq! (CTM.jl:146-165)
    def update_vsq(self, d, niter, ntol):
        for i in range(self.K):
            for _ in range(niter):
                rho = 1.0
                e = self.C[d] * np.exp(self.lam[d][i] + 0.5 * self.vsq[d][i] - self.logzeta[d])
                grad = -0.5 * (self.invsigma[i, i] + e - 1.0 / self.vsq[d][i])
                invhess = -1.0 / (0.25 * e + 0.5 / self.vsq[d][i] ** 2)
                p = invhess * grad
                while self.vsq[d][i] - rho * p <= 0:
                    rho *= 0.5
                self.vsq[d][i] -= rho * p
                if rho * abs(grad) < ntol:
                    break
        self.vsq[d] = self.vsq[d] + EPS

    # update_lambda! (CTM.jl:129-142)
    def update_lambda(self, d, niter, ntol):
        self.lam_old[d] = self.lam[d]
        _, counts = self.docs[d]
        lam = self.lam[d].copy()
        pc = self.phi @ counts
        for _ in range(niter):
            e = self.C[d] * np.exp(lam + 0.5 * self.vsq[d] - self.logzeta[d])
            grad = self.invsigma @ (self.mu - lam) + pc - e
            neg_hess = self.invsigma + np.diag(e)
            lam = lam + np.linalg.solve(neg_hess, grad)
            if np.linalg.norm(grad) < ntol:
                break
        self.lam[d] = lam

    def accum_beta(self, d):
        terms, counts = self.docs[d]
        # last phi = f(beta, lambda_old)
        with np.errstate(divide="ignore"):
            self.phi = _softmax_cols(np.log(self.beta[:, terms]) + self.lam_old[d][:, None])
        np.add.at(self.beta_temp, (slice(None), terms), self.phi * counts[None, :])

    def swap_beta(self):
        self.beta_old = self.beta
        self.beta = self.beta_temp / self.beta_temp.sum(axis=1, keepdims=True)
        self.beta_temp = np.zeros((self.K, self.V))

    # update_sigma! with old mu, then update_mu! (CTM.jl:102-111, 206-208)
    def update_sigma_mu(self):
        lam = np.stack(self.lam)  # [M, K]
        centered = lam - self.mu
        self.sigma = (np.diag(np.sum(self.vsq, axis=0)) + centered.T @ centered) / self.M
        self.sigma = 0.5 * (self.sigma + self.sigma.T)
        self.invsigma = np.linalg.inv(self.sigma)
        self.invsigma = 0.5 * (self.invsigma + self.invsigma.T)
        self.mu = lam.sum(axis=0) / self.M

    # update_elbo! (CTM.jl:89-98)
    def update_elbo(self):
        total = 0.0
        sign, logdet_inv = np.linalg.slogdet(self.invsigma)
        for d in range(self.M):
            terms, counts = self.docs[d]
            with np.errstate(divide="ignore"):
                phi = _softmax_cols(np.log(self.beta_old[:, terms]) + self.lam_old[d][:, None])
            la, v, lz = self.lam[d], self.vsq[d], self.logzeta[d]
            diff = la - self.mu
            e_peta = 0.5 * (logdet_inv - self.K * np.log(2 * np.pi)
                            - np.diag(self.invsigma) @ v - diff @ self.invsigma @ diff)
            e_pz = (phi.T @ la) @ counts - self.C[d] * (
                np.exp(la + 0.5 * v - lz).sum() + lz - 1.0
            )
            e_pw = np.sum(phi * np.log(self.beta[:, terms] + EPS) * counts[None, :])
            e_qeta = 0.5 * self.K * (1 + np.log(2 * np.pi)) + 0.5 * np.log(v).sum()
            e_qz = -np.sum(counts * np.sum(phi * np.log(phi), axis=0))
            total += e_peta + e_pz + e_pw + e_qeta + e_qz
        self.elbo = total
        return total

    # train! (CTM.jl:185-217)
    def train(self, iters, viter=10, vtol=None, niter=1000, ntol=None):
        vtol = 1.0 / self.K**2 if vtol is None else vtol
        ntol = 1.0 / self.K**2 if ntol is None else ntol
        elbos = []
        for _ in range(iters):
            for d in range(self.M):
                for _v in range(viter):
                    self.update_phi(d)
                    self.update_logzeta(d)
                    self.update_vsq(d, niter, ntol)
                    self.update_lambda(d, niter, ntol)
                    if np.linalg.norm(self.lam[d] - self.lam_old[d]) < vtol:
                        break
                self.accum_beta(d)
            self.swap_beta()
            self.update_sigma_mu()
            elbos.append(self.update_elbo())
        return elbos


class FCTMOracle(CTMOracle):
    """Reference CPU fCTM (fCTM.jl), float64, per-doc sweep."""

    def __init__(self, docs, V, K, beta0, kappa0):
        super().__init__(docs, V, K, beta0)
        self.eta = 0.5
        self.kappa = np.asarray(kappa0, np.float64).copy()
        self.kappa_old = self.kappa.copy()
        self.kappa_temp = np.zeros(V)
        self.tau = [np.full(len(t), self.eta) for t, _ in self.docs]
        self.tau_old = [t.copy() for t in self.tau]

    # update_phi! (fCTM.jl:230-233)
    def update_phi(self, d):
        terms, _ = self.docs[d]
        x = self.tau[d][None, :] * np.log(self.beta[:, terms] + EPS) + self.lam[d][:, None]
        self.phi = _softmax_cols(x)

    # update_tau! (fCTM.jl:221-226)
    def update_tau(self, d):
        self.tau_old[d] = self.tau[d]
        terms, _ = self.docs[d]
        prod = np.prod(self.beta[:, terms] ** (-self.phi), axis=0)
        self.tau[d] = self.eta / (self.eta + (1 - self.eta) * self.kappa[terms] * prod + EPS)

    # stats (fCTM.jl:168-171, 154-157) with last phi = f(beta, tau_old, lam_old)
    def accum(self, d):
        terms, counts = self.docs[d]
        x = self.tau_old[d][None, :] * np.log(self.beta[:, terms] + EPS) \
            + self.lam_old[d][:, None]
        self.phi = _softmax_cols(x)
        np.add.at(self.beta_temp, (slice(None), terms),
                  self.phi * (self.tau[d] * counts)[None, :])
        np.add.at(self.kappa_temp, terms, (1 - self.tau[d]) * counts)

    def swap(self):
        self.swap_beta()
        self.kappa_old = self.kappa
        self.kappa = self.kappa_temp / self.kappa_temp.sum()
        self.kappa_temp = np.zeros(self.V)

    # update_elbo! (fCTM.jl:114-124)
    def update_elbo(self):
        total = 0.0
        sign, logdet_inv = np.linalg.slogdet(self.invsigma)
        for d in range(self.M):
            terms, counts = self.docs[d]
            x = self.tau_old[d][None, :] * np.log(self.beta_old[:, terms] + EPS) \
                + self.lam_old[d][:, None]
            phi = _softmax_cols(x)
            la, v, lz, ta = self.lam[d], self.vsq[d], self.logzeta[d], self.tau[d]
            diff = la - self.mu
            e_peta = 0.5 * (logdet_inv - self.K * np.log(2 * np.pi)
                            - np.diag(self.invsigma) @ v - diff @ self.invsigma @ diff)
            tc = ta @ counts
            e_pc = np.log(self.eta**tc * (1 - self.eta) ** (self.C[d] - tc) + EPS)
            e_pz = (phi.T @ la) @ counts - self.C[d] * (
                np.exp(la + 0.5 * v - lz).sum() + lz - 1.0
            )
            e_pw = np.sum(phi * np.log(self.beta[:, terms] + EPS) * (counts * ta)[None, :]) \
                + (counts * (1 - ta)) @ np.log(self.kappa[terms] + EPS)
            e_qeta = 0.5 * self.K * (1 + np.log(2 * np.pi)) + 0.5 * np.log(v).sum()
            with np.errstate(divide="ignore", invalid="ignore"):
                tl = np.where(ta > 0, ta * np.log(ta), 0.0)
                tl1 = np.where(ta < 1, (1 - ta) * np.log(1 - ta), 0.0)
            e_qc = -(counts @ (tl + tl1))
            e_qz = -np.sum(counts * np.sum(phi * np.log(phi), axis=0))
            total += e_peta + e_pc + e_pz + e_pw + e_qeta + e_qc + e_qz
        self.elbo = total
        return total

    # train! (fCTM.jl:240-276) — note lambda BEFORE vsq; eta never updated
    def train(self, iters, viter=10, vtol=None, niter=1000, ntol=None):
        vtol = 1.0 / self.K**2 if vtol is None else vtol
        ntol = 1.0 / self.K**2 if ntol is None else ntol
        elbos = []
        for _ in range(iters):
            for d in range(self.M):
                for _v in range(viter):
                    self.update_phi(d)
                    self.update_tau(d)
                    self.update_logzeta(d)
                    self.update_lambda(d, niter, ntol)
                    self.update_vsq(d, niter, ntol)
                    if np.linalg.norm(self.lam[d] - self.lam_old[d]) < vtol:
                        break
                self.accum(d)
            self.swap()
            self.update_sigma_mu()
            elbos.append(self.update_elbo())
        return elbos


def docs_from_corpus(corp):
    return [
        (np.asarray(doc.terms, np.int64) - 1, np.asarray(doc.counts, np.float64))
        for doc in corp.docs
    ]

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.metrics import (
    RunningStats,
    compute_statistics,
    fid_from_stats,
    frechet_distance,
    precision_recall,
)
from diffusion_uncertainty_tpu.metrics.features import RandomConvFeatures
from diffusion_uncertainty_tpu.metrics.fid import FIDEvaluator, extract_features
from diffusion_uncertainty_tpu.metrics.nll import (
    calc_bpd_loop,
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from diffusion_uncertainty_tpu.diffusion import make_schedule


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, s = compute_statistics(f)
    assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_gaussian_analytic():
    """FID between N(0,I) and N(m,I) is ||m||^2 exactly."""
    d = 8
    mu1, s1 = np.zeros(d), np.eye(d)
    mu2 = np.full(d, 0.5)
    assert frechet_distance(mu1, s1, mu2, np.eye(d)) == pytest.approx(d * 0.25, rel=1e-9)
    # different variances: trace term (sqrt(1*4)=2): d*(1+4-2*2)=d
    assert frechet_distance(mu1, s1, mu1, 4 * np.eye(d)) == pytest.approx(d, rel=1e-9)


def test_running_stats_matches_numpy_cov():
    rng = np.random.RandomState(1)
    f = rng.randn(1000, 5)
    rs = RunningStats(5)
    for lo in range(0, 1000, 128):
        rs.update(f[lo : lo + 128])
    mu, cov = rs.finalize()
    np.testing.assert_allclose(mu, f.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(f, rowvar=False), rtol=1e-8)


def test_fid_evaluator_sensitivity():
    """FID(real-like, real-like) should be far below FID(real-like, shifted)."""
    ext = RandomConvFeatures(dim=64)
    rng = np.random.RandomState(2)
    real = rng.randint(0, 256, (256, 32, 32, 3), np.uint8)
    similar = rng.randint(0, 256, (256, 32, 32, 3), np.uint8)
    shifted = np.clip(rng.randint(0, 64, (256, 32, 32, 3)), 0, 255).astype(np.uint8)

    real_stats = compute_statistics(extract_features(ext, real))
    ev_same = FIDEvaluator(ext, real_stats)
    ev_same.update(similar)
    ev_diff = FIDEvaluator(ext, real_stats)
    ev_diff.update(shifted)
    assert ev_same.compute() < ev_diff.compute() / 5


def test_precision_recall_identical_distributions():
    rng = np.random.RandomState(3)
    real = rng.randn(400, 16).astype(np.float32)
    gen = rng.randn(400, 16).astype(np.float32)
    pr = precision_recall(real, gen, k=3)
    # finite-sample improved-PR on N=400 in 16-dim sits well below 1.0 even for
    # identical distributions; the discriminative signal is vs the disjoint case
    assert pr.precision > 0.6 and pr.recall > 0.6


def test_precision_recall_disjoint_distributions():
    rng = np.random.RandomState(4)
    real = rng.randn(300, 16).astype(np.float32)
    gen = rng.randn(300, 16).astype(np.float32) + 50.0
    pr = precision_recall(real, gen, k=3)
    assert pr.precision < 0.05 and pr.recall < 0.05


def test_precision_recall_mode_collapse():
    """Generator covering a tiny region: precision high, recall low."""
    rng = np.random.RandomState(5)
    real = rng.randn(400, 8).astype(np.float32)
    gen = (0.01 * rng.randn(400, 8)).astype(np.float32)  # collapsed at origin
    pr = precision_recall(real, gen, k=3)
    assert pr.precision > 0.9
    assert pr.recall < 0.3


def test_normal_kl_zero_for_identical():
    m = jnp.asarray([0.3, -1.0])
    lv = jnp.asarray([0.1, -0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)


def test_discretized_gaussian_ll_peaks_at_mean():
    x = jnp.linspace(-0.5, 0.5, 11)
    ll = discretized_gaussian_log_likelihood(x, jnp.zeros_like(x), jnp.full_like(x, -3.0))
    assert int(jnp.argmax(ll)) == 5  # max at x == mean


def test_bpd_loop_runs_and_is_positive():
    sched = make_schedule("linear", 20)  # tiny chain for test speed

    def model_fn6(x, t, key):
        eps = 0.1 * x
        var = jnp.zeros_like(x)  # learned_range midpoint
        return jnp.concatenate([eps, var], axis=-1)

    x0 = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3), minval=-1, maxval=1)
    res = calc_bpd_loop(model_fn6, sched, x0, jax.random.key(1))
    assert res.total_bpd.shape == (2,)
    assert res.vb_terms.shape == (20, 2)
    assert bool(jnp.all(res.total_bpd > 0))
    assert bool(jnp.all(jnp.isfinite(res.total_bpd)))


def test_bpd_oracle_model_lower_than_bad_model():
    sched = make_schedule("linear", 20)
    x0 = jax.random.uniform(jax.random.key(2), (2, 8, 8, 3), minval=-1, maxval=1)

    # oracle epsilon cannot be expressed as fn(x_t) alone, but a scaled-x model
    # approximating the posterior should beat a zero model
    def good(x, t, key):
        # epsilon ~ x_t for heavily-noised inputs (x_t ≈ eps at high t)
        return jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)

    def bad(x, t, key):
        return jnp.concatenate([jnp.full_like(x, 5.0), jnp.zeros_like(x)], axis=-1)

    bpd_good = float(calc_bpd_loop(good, sched, x0, jax.random.key(3)).total_bpd.mean())
    bpd_bad = float(calc_bpd_loop(bad, sched, x0, jax.random.key(3)).total_bpd.mean())
    assert bpd_good < bpd_bad


def test_vgg16_converter_matches_torch_forward():
    """Numerical parity of the flax VGG16-fc2 extractor vs a hand-built torch
    model with torchvision key layout — catches the NCHW flatten-order trap
    (fc1 consumes [512,7,7] in channel-major order)."""
    import torch
    import torch.nn as tnn

    from diffusion_uncertainty_tpu.metrics.features import (
        VGG16,
        _VGG16_CHANNELS,
        _VGG16_CONV_IDX,
        _VGG16_POOL_AFTER,
        convert_vgg16,
    )

    torch.manual_seed(0)
    layers = []
    c_in = 3
    for i, ch in enumerate(_VGG16_CHANNELS):
        layers += [tnn.Conv2d(c_in, ch, 3, padding=1), tnn.ReLU()]
        if i in _VGG16_POOL_AFTER:
            layers.append(tnn.MaxPool2d(2, 2))
        c_in = ch
    features = tnn.Sequential(*layers)
    classifier = tnn.Sequential(
        tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
        tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(), tnn.Linear(4096, 1000),
    )
    for m in list(features) + list(classifier):
        if hasattr(m, "weight"):
            tnn.init.normal_(m.weight, std=0.05)
            tnn.init.normal_(m.bias, std=0.05)

    # export with torchvision key names
    sd = {}
    conv_i = 0
    for idx, m in enumerate(features):
        if isinstance(m, tnn.Conv2d):
            assert idx == _VGG16_CONV_IDX[conv_i]
            sd[f"features.{idx}.weight"] = m.weight.detach().numpy()
            sd[f"features.{idx}.bias"] = m.bias.detach().numpy()
            conv_i += 1
    for i in (0, 3, 6):
        sd[f"classifier.{i}.weight"] = classifier[i].weight.detach().numpy()
        sd[f"classifier.{i}.bias"] = classifier[i].bias.detach().numpy()

    params = jax.tree.map(jnp.asarray, convert_vgg16(sd))
    x = np.random.RandomState(1).rand(2, 224, 224, 3).astype(np.float32)

    features.eval()
    classifier.eval()
    with torch.no_grad():
        t_feat = features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t_out = classifier[:4](t_feat.reshape(2, -1)).numpy()
    j_out = np.asarray(VGG16().apply(params, jnp.asarray(x)))
    # f32 accumulation over the 25088-wide fc1 matmul: compare on a
    # scale-relative tolerance
    scale = np.abs(t_out).max()
    np.testing.assert_allclose(j_out / scale, t_out / scale, atol=1e-4)


def test_vgg16_features_wrapper_pads_small_images(tmp_path):
    """uint8 [N,32,32,3] goes through the 224-pad path and returns [N,4096]."""
    import torch

    from diffusion_uncertainty_tpu.metrics.features import (
        VGG16,
        _VGG16_CHANNELS,
        _VGG16_CONV_IDX,
        VGG16Features,
    )

    # tiny random checkpoint in torchvision layout
    rs = np.random.RandomState(0)
    sd = {}
    c_in = 3
    for i, (idx, ch) in enumerate(zip(_VGG16_CONV_IDX, _VGG16_CHANNELS)):
        sd[f"features.{idx}.weight"] = torch.tensor(rs.randn(ch, c_in, 3, 3).astype(np.float32) * 0.02)
        sd[f"features.{idx}.bias"] = torch.tensor(rs.randn(ch).astype(np.float32) * 0.02)
        c_in = ch
    sd["classifier.0.weight"] = torch.tensor(rs.randn(4096, 512 * 7 * 7).astype(np.float32) * 0.002)
    sd["classifier.0.bias"] = torch.tensor(rs.randn(4096).astype(np.float32) * 0.02)
    for i in (3, 6):
        out_d = 4096 if i == 3 else 1000
        sd[f"classifier.{i}.weight"] = torch.tensor(rs.randn(out_d, 4096).astype(np.float32) * 0.002)
        sd[f"classifier.{i}.bias"] = torch.tensor(rs.randn(out_d).astype(np.float32) * 0.02)
    p = tmp_path / "vgg16.pth"
    torch.save(sd, p)

    ext = VGG16Features(p)
    imgs = (rs.rand(3, 32, 32, 3) * 255).astype(np.uint8)
    feats = np.asarray(ext(jnp.asarray(imgs)))
    assert feats.shape == (3, 4096)
    assert np.isfinite(feats).all()
    assert ext.dim == 4096


def test_inception_converter_matches_torch_forward():
    """Numerical parity of the flax pytorch-fid InceptionV3 vs a hand-built
    torch model with torchvision/pytorch-fid key layout and the FID variant's
    pooling quirks (count_include_pad=False average pools in A/C/E, max-pool
    branch in the final InceptionE) — catches conv-transpose, BN-eps, padding
    and pooling-semantics bugs (VERDICT r3 #2). Runs the trunk on 128² inputs
    (fully convolutional; the 299² resize lives in InceptionV3Features)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    from diffusion_uncertainty_tpu.metrics.features import (
        InceptionV3,
        convert_inception,
    )

    class BasicConv2d(tnn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = tnn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avgp(x):  # the pytorch-fid patch: count_include_pad=False
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    class IncA(tnn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            return torch.cat(
                [self.branch1x1(x), b5, bd, self.branch_pool(avgp(x))], 1
            )

    class IncB(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            return torch.cat([self.branch3x3(x), bd, F.max_pool2d(x, 3, 2)], 1)

    class IncC(tnn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(
                self.branch7x7dbl_4(
                    self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
                )
            )
            return torch.cat(
                [self.branch1x1(x), b7, bd, self.branch_pool(avgp(x))], 1
            )

    class IncD(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(
                self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
            )
            return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    class IncE(tnn.Module):
        def __init__(self, cin, pool="avg"):
            super().__init__()
            self.pool = pool
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            if self.pool == "max":  # pytorch-fid FIDInceptionE_2 (Mixed_7c)
                bp = F.max_pool2d(x, 3, stride=1, padding=1)
            else:  # FIDInceptionE_1
                bp = avgp(x)
            return torch.cat(
                [self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1
            )

    class FIDInceptionTrunk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)
            self.Mixed_7a = IncD(768)
            self.Mixed_7b = IncE(1280)
            self.Mixed_7c = IncE(2048, pool="max")

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, 2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, 2)
            for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                      self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                      self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
                x = m(x)
            return F.adaptive_avg_pool2d(x, 1).flatten(1)

    torch.manual_seed(0)
    ref = FIDInceptionTrunk().eval()
    # sharpen: random (non-identity) BN statistics and affine params
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.05, generator=gen)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1, generator=gen)
                m.bias.normal_(0.0, 0.1, generator=gen)
                m.running_mean.normal_(0.0, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_inception(sd))

    x = (np.random.RandomState(2).rand(2, 128, 128, 3).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        t_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(InceptionV3().apply(params, jnp.asarray(x)))
    assert j_out.shape == (2, 2048)
    scale = np.abs(t_out).max()
    np.testing.assert_allclose(j_out / scale, t_out / scale, atol=2e-4)

"""Pure-torch oracle models for numeric parity tests.

These re-create the torchvision/reference architectures with torch.nn so
that (a) converted state dicts exercise models/torch_import.py and (b) our
flax modules can be checked numerically against torch on CPU. Test-only
code; the framework itself never imports torch for compute.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(y + idt)


class TorchResNet18Features(nn.Module):
    """torchvision resnet18 trunk emitting the 5 monodepth2 features,
    including the (x - 0.45)/0.225 normalization."""

    def __init__(self, num_input_images=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64),
                                    TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2),
                                    TorchBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2),
                                    TorchBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, 2),
                                    TorchBasicBlock(512, 512))

    def forward(self, x):
        x = (x - 0.45) / 0.225
        feats = [F.relu(self.bn1(self.conv1(x)))]
        feats.append(self.layer1(self.maxpool(feats[-1])))
        feats.append(self.layer2(feats[-1]))
        feats.append(self.layer3(feats[-1]))
        feats.append(self.layer4(feats[-1]))
        return feats


class TorchConv3x3(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3)
        self.pad = nn.ReflectionPad2d(1)

    def forward(self, x):
        return self.conv(self.pad(x))


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TorchConv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


class TorchDepthDecoder(nn.Module):
    def __init__(self, num_ch_enc=(64, 64, 128, 256, 512),
                 scales=(0, 1, 2, 3)):
        super().__init__()
        num_ch_dec = [16, 32, 64, 128, 256]
        self.scales = scales
        mods = []
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
        for s in scales:
            mods.append(TorchConv3x3(num_ch_dec[s], 1))
        self.decoder = nn.ModuleList(mods)

    def forward(self, features):
        outputs = {}
        x = features[-1]
        k = 0
        for i in range(4, -1, -1):
            x = self.decoder[k](x); k += 1
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, features[i - 1]], 1)
            x = self.decoder[k](x); k += 1
            if i in self.scales:
                outputs[("disp", i)] = torch.sigmoid(
                    self.decoder[10 + list(self.scales).index(i)](x))
        return outputs


class TorchPoseDecoder(nn.Module):
    def __init__(self, num_input_features=1, num_frames_to_predict_for=2):
        super().__init__()
        self.nf = num_frames_to_predict_for
        self.net = nn.ModuleList([
            nn.Conv2d(512, 256, 1),
            nn.Conv2d(num_input_features * 256, 256, 3, 1, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 6 * num_frames_to_predict_for, 1),
        ])

    def forward(self, input_features):
        last = [f[-1] for f in input_features]
        cat = torch.cat([F.relu(self.net[0](f)) for f in last], 1)
        out = F.relu(self.net[1](cat))
        out = F.relu(self.net[2](out))
        out = self.net[3](out)
        out = out.mean(3).mean(2)
        out = 0.01 * out.view(-1, self.nf, 1, 6)
        return out[..., :3], out[..., 3:]


class TorchSimSiam(nn.Module):
    def __init__(self, dim=1000, pred_dim=512, prev_dim=512):
        super().__init__()
        self.projector = nn.Sequential(
            nn.Linear(prev_dim, prev_dim, bias=False),
            nn.BatchNorm1d(prev_dim), nn.ReLU(inplace=True),
            nn.Linear(prev_dim, prev_dim, bias=False),
            nn.BatchNorm1d(prev_dim), nn.ReLU(inplace=True),
            nn.Linear(prev_dim, dim, bias=False),
            nn.BatchNorm1d(dim, affine=False))
        self.predictor = nn.Sequential(
            nn.Linear(dim, pred_dim, bias=False),
            nn.BatchNorm1d(pred_dim), nn.ReLU(inplace=True),
            nn.Linear(pred_dim, dim))
        self.cos = nn.CosineSimilarity()

    def forward(self, f1, f2):
        x1 = f1[-1].mean((2, 3))
        x2 = f2[-1].mean((2, 3))
        z1, z2 = self.projector(x1), self.projector(x2)
        p1, p2 = self.predictor(z1), self.predictor(z2)
        z1, z2 = z1.detach(), z2.detach()
        return -(self.cos(p1, z2).mean() + self.cos(p2, z1).mean()) * 0.5

"""Torch CPU oracle models (torchvision is not installed; these mirror the
torchvision resnet50/vgg16 architectures and state_dict naming exactly so
the converter can be golden-tested)."""

import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34), identical state_dict names."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet50Trunk(nn.Module):
    """torchvision resnet minus avgpool/fc, returning C2..C5 (block=
    Bottleneck mirrors resnet50/101/152; BasicBlock mirrors 18/34)."""

    def __init__(self, stage_sizes=(3, 4, 6, 3), block=Bottleneck):
        super().__init__()
        self.block = block
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, stage_sizes[0], stride=1)
        self.layer2 = self._make_layer(128, stage_sizes[1], stride=2)
        self.layer3 = self._make_layer(256, stage_sizes[2], stride=2)
        self.layer4 = self._make_layer(512, stage_sizes[3], stride=2)

    def _make_layer(self, planes, blocks, stride):
        exp = self.block.expansion
        downsample = None
        if stride != 1 or self.inplanes != planes * exp:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * exp, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * exp),
            )
        layers = [self.block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * exp
        for _ in range(1, blocks):
            layers.append(self.block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


class VGG16Features(nn.Module):
    """torchvision vgg16/19 .features with identical state_dict indices.

    ``depths`` = convs per block ((2,2,3,3,3) vgg16, (2,2,4,4,4) vgg19);
    taps are the post-ReLU outputs of the last conv in blocks 3/4/5
    (indices 15/22/29 for vgg16 — the hardcoded values this class used
    before it was depth-parameterized)."""

    def __init__(self, depths=(2, 2, 3, 3, 3)):
        super().__init__()
        chans = (64, 128, 256, 512, 512)
        layers = []
        taps = []
        in_ch = 3
        for b, (n, ch) in enumerate(zip(depths, chans)):
            if b > 0:
                layers.append(nn.MaxPool2d(2, 2))
            for _ in range(n):
                layers.append(nn.Conv2d(in_ch, ch, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_ch = ch
            if b >= 2:  # post-ReLU of the block's last conv
                taps.append(len(layers) - 1)
        self.features = nn.Sequential(*layers)
        self._taps = tuple(taps)

    def forward(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self._taps:
                out.append(x)
        c2, c3, c4 = out
        c5 = torch.nn.functional.max_pool2d(c4, 2, 2)
        return c2, c3, c4, c5

from .interface import NetState, Network, NetworkSpec, normalize_p
from .optim import Adam, CyclicNesterov, OptimiserSpec
from .resnet import ResNetSpec
from .simplenet import SimpleNetSpec

"""Backbones. All shipped reference configs use an identity backbone over
pre-extracted features (reference conf/model/backbone/identity.yaml)."""


class Identity:
    def init(self, rng):
        return {}

    def apply(self, params, x):
        return x

    def __call__(self, params, x):
        return x

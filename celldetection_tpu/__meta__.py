__title__ = 'celldetection-tpu'
__version__ = '0.1.0'
__summary__ = 'TPU-native (JAX/XLA/Pallas) cell instance segmentation with Contour Proposal Networks'
__license__ = 'Apache-2.0'

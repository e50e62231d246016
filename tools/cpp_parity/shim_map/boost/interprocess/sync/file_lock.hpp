#pragma once
// Stub: included by surfel_map.h, unused by the compiled paths.

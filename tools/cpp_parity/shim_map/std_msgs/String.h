#pragma once
#include <memory>
#include <string>

namespace std_msgs {
struct String {
    std::string data;
};
typedef std::shared_ptr<const String> StringConstPtr;
}  // namespace std_msgs
